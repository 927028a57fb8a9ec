"""As-of and range joins — classic operators Spark lacks natively
(SURVEY §2.3 notes their absence in both Spark and the reference; they are
table stakes for event/time-series querying over the `events` surface).

``asof_join`` uses the union+window formulation: tag both sides, union on
(key, ts), and carry the most recent right-side payload forward with
``last(..., ignorenulls=True)`` over an ordered window. ONE shuffle on the
key — never a per-key loop, never a range cross-join — so it scales exactly
like any windowed aggregation. Equal timestamps match (right sorts before
left at the same instant), mirroring DuckDB/kdb ``ASOF JOIN`` `<=`
semantics.

``range_join_binned`` is the scalable band-join pattern: bin the right
side's timestamp by the window width, explode each left row to the two
bins its window can touch, equi-join on (key, bin), then filter the exact
range. Each matching pair is produced exactly once (a right row lives in
one bin; the left window spans at most two), so no dedup pass is needed.
Turns an otherwise O(n·m) theta join into a hash join Catalyst can
shuffle-partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tag_union_sides(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None,
) -> tuple[DataFrame, DataFrame, list[str], list[str]]:
    """Shared union-tagging preamble for the as-of variants: left rows
    tagged ``_side=1`` with null right-payload slots, right rows tagged
    ``_side=0`` with null left-payload slots, both on a common ``_ts``.
    One definition so the two as-of operators cannot diverge on the
    tagging scheme. Returns (l, r, left_payload, right_cols)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *left_payload,
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_cols
        ],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    return l, r, left_payload, right_cols


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` keys.

    Output: every left column plus ``matched_<c>`` for each requested right
    payload column and ``matched_ts``. ``how='left'`` keeps unmatched left
    rows with nulls; ``'inner'`` drops them (ASOF JOIN default).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join how must be 'inner' or 'left', got {how!r}")
    l, r, left_payload, right_cols = _tag_union_sides(
        left, right, on, left_ts, right_ts, right_cols
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        F.last("_rts", ignorenulls=True).over(w).alias("matched_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"matched_{c}")
            for c in right_cols
        ],
    )
    out = (
        carried.filter(F.col("_side") == 1)
        .drop("_side", "_rts", *[f"_r_{c}" for c in right_cols])
        .withColumnRenamed("_ts", left_ts)
    )
    if how == "inner":
        out = out.filter(F.col("matched_ts").isNotNull())
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest', tolerance=...)``): for each left row, the right row with the
    smallest absolute timestamp gap within the same keys, optionally
    bounded by ``tolerance_us`` microseconds; unmatched left rows drop
    (inner). Tie (equal gap before and after) goes to the PREVIOUS row —
    documented, engine-portable, and exercised by the equal-instant case
    (gap 0 is always a backward match, so the forward stream can be
    strictly-after).

    Same union+window shape as ``asof_join`` — the backward carry and the
    forward carry are two frames over ONE (key, ts) sort, so the whole
    operator costs a single shuffle regardless of data size; no range
    cross-join exists at any scale. Both directions' gaps are exact BIGINT
    micros, so the nearest/tie decision replays identically in any engine.
    Determinism precondition (shared with ``asof_join``): right-side
    (keys, ts) must be unique — with duplicates, which payload is carried
    is tie-broken arbitrarily by both engines.

    Output: every left column plus ``matched_ts``, ``matched_<c>`` for the
    requested right payloads, ``gap_us`` (BIGINT), and ``dir``
    ('prev'/'next')."""
    l, r, left_payload, right_cols = _tag_union_sides(
        left, right, on, left_ts, right_ts, right_cols
    )
    wb = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward carry as a DESC-ordered BACKWARD frame, not
    # currentRow..unboundedFollowing: Spark evaluates an
    # UnboundedFollowing frame by rescanning current→end PER ROW — O(n²)
    # per partition, measured 44 s on one 100k-row hot-key partition in
    # the round-8 zipf sweep where everything else took ~1 s. last() over
    # the exact-reverse ordering ((_ts, _side) DESC) is the same value —
    # first non-null at-or-after in ASC — including at ties, because
    # (_ts, _side) ordering places a tied right row (side 0) before the
    # left row in ASC and after it in DESC, excluding it from the forward
    # frame in both forms. Incremental O(n); same single exchange (two
    # sorts inside one partitioning).
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.desc("_ts"), F.desc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .select(
            "*",
            F.last("_rts", ignorenulls=True).over(wb).alias("_pts"),
            *[
                F.last(f"_r_{c}", ignorenulls=True).over(wb).alias(f"_p_{c}")
                for c in right_cols
            ],
            F.last("_rts", ignorenulls=True).over(wf).alias("_nts"),
            *[
                F.last(f"_r_{c}", ignorenulls=True).over(wf).alias(f"_n_{c}")
                for c in right_cols
            ],
        )
        .filter(F.col("_side") == 1)
    )
    tus = F.unix_micros(F.col("_ts"))
    gp = tus - F.unix_micros(F.col("_pts"))
    gn = F.unix_micros(F.col("_nts")) - tus
    if tolerance_us is not None:
        gp = F.when(gp <= F.lit(int(tolerance_us)), gp)
        gn = F.when(gn <= F.lit(int(tolerance_us)), gn)
    sel = carried.withColumn("_gp", gp).withColumn("_gn", gn)
    use_prev = F.col("_gp").isNotNull() & (
        F.col("_gn").isNull() | (F.col("_gp") <= F.col("_gn"))
    )
    out = (
        sel.filter(F.col("_gp").isNotNull() | F.col("_gn").isNotNull())
        .select(
            *on,
            F.col("_ts").alias(left_ts),
            *left_payload,
            F.when(use_prev, F.col("_pts")).otherwise(F.col("_nts")).alias(
                "matched_ts"
            ),
            *[
                F.when(use_prev, F.col(f"_p_{c}"))
                .otherwise(F.col(f"_n_{c}"))
                .alias(f"matched_{c}")
                for c in right_cols
            ],
            F.when(use_prev, F.col("_gp")).otherwise(F.col("_gn")).alias("gap_us"),
            F.when(use_prev, F.lit("prev")).otherwise(F.lit("next")).alias("dir"),
        )
    )
    return out


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 86400,
) -> DataFrame:
    """Band join: pairs (l, r) with same keys and
    ``l.ts <= r.ts < l.ts + window_seconds``, via bin-equi-join instead of
    a theta join. Columns are prefixed ``l_``/``r_`` on collision."""
    w = F.lit(window_seconds)
    lsec = F.unix_timestamp(F.col(left_ts))
    rsec = F.unix_timestamp(F.col(right_ts))

    r2 = right.withColumn("_bin", F.floor(rsec / w))
    overlap = set(left.columns) & set(right.columns) - set(on)
    l_ren = left
    for c in overlap:
        l_ren = l_ren.withColumnRenamed(c, f"l_{c}")
    r_ren = r2
    for c in overlap:
        r_ren = r_ren.withColumnRenamed(c, f"r_{c}")
    l_ts_col = f"l_{left_ts}" if left_ts in overlap else left_ts
    r_ts_col = f"r_{right_ts}" if right_ts in overlap else right_ts

    lsec = F.unix_timestamp(F.col(l_ts_col))
    exploded = l_ren.withColumn(
        "_bin", F.explode(F.array(F.floor(lsec / w), F.floor(lsec / w) + 1))
    )
    joined = exploded.join(r_ren, [*on, "_bin"])
    # The bins are second-truncated (coarse is fine: two width-w bins cover
    # any exact [l, l+w) window), but the final filter must compare the
    # EXACT timestamps — truncating here would admit sub-second-early rows
    # and drop boundary rows on fractional-second data.
    return joined.filter(
        (F.col(r_ts_col) >= F.col(l_ts_col))
        & (
            F.col(r_ts_col)
            < F.col(l_ts_col) + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
        )
    ).drop("_bin")


def salted_group_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: partial sums over
    (keys, salt) spread a hot key across ``n_salt`` reducers, then a final
    (cheap — ``n_salt`` rows per key) re-aggregation. The salt is a
    per-row id, NOT a row hash — a hot key made of identical rows (the
    canonical skew case: repeated events) would hash to ONE salt and defeat
    the spread. The salt assignment varies run-to-run, but sums/counts are
    reassociable, so the OUTPUT is identical to a plain groupBy-sum
    regardless of assignment; the win is purely physical."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).alias("_salt")
    partial = (
        df.select(*keys, F.col(value_col), salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value_col).alias("_partial_sum"), F.count("*").alias("_partial_n"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_partial_sum").alias(f"sum_{value_col}"),
        F.sum("_partial_n").cast("long").alias("n_rows"),
    )
