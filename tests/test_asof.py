"""As-of join, binned range join, and salted aggregation semantics."""

from datetime import datetime

from pyspark.sql import functions as F

from vector_search_spark.operators.asof import (
    asof_join,
    range_join_binned,
    salted_group_sum,
)


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_asof_backward_and_ties(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),   # matches quote@10:00 (equal ts)
            (1, _ts("2024-01-01 11:30:00"), "b"),   # matches quote@11:00
            (1, _ts("2024-01-01 09:00:00"), "c"),   # before any quote → unmatched
            (2, _ts("2024-01-01 12:00:00"), "d"),   # other key
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 11:00:00"), 110.0),
            (2, _ts("2024-01-01 00:00:00"), 200.0),
        ],
        "k int, ts timestamp, px double",
    )
    got = {
        r.tag: (r.matched_px, r.matched_ts)
        for r in asof_join(left, right, ["k"], right_cols=["px"], how="left").collect()
    }
    assert got["a"] == (100.0, _ts("2024-01-01 10:00:00"))  # <= includes equal ts
    assert got["b"] == (110.0, _ts("2024-01-01 11:00:00"))
    assert got["c"] == (None, None)
    assert got["d"] == (200.0, _ts("2024-01-01 00:00:00"))
    inner = asof_join(left, right, ["k"], right_cols=["px"], how="inner")
    assert {r.tag for r in inner.collect()} == {"a", "b", "d"}


def test_range_join_binned_equals_theta_join(spark, sf_dir):
    from vector_search_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").limit(2000)
    p = ev.filter("event_type = 'purchase'").select("user_id", "ts", "event_id")
    v = ev.filter("event_type = 'view'").select("user_id", "ts", "value")
    binned = (
        range_join_binned(p, v, ["user_id"], window_seconds=3600)
        .groupBy("event_id")
        .count()
    )
    theta = (
        p.alias("p")
        .join(
            v.alias("v"),
            (F.col("p.user_id") == F.col("v.user_id"))
            & (F.col("v.ts") >= F.col("p.ts"))
            & (
                F.unix_timestamp("v.ts") < F.unix_timestamp("p.ts") + 3600
            ),
        )
        .groupBy("p.event_id")
        .count()
    )
    assert {(r.event_id, r["count"]) for r in binned.collect()} == {
        (r.event_id, r["count"]) for r in theta.collect()
    }


def test_salted_sum_equals_plain(spark, sf_dir):
    from vector_search_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    salted = {
        r.l_returnflag: (round(r.sum_l_quantity, 6), r.n_rows)
        for r in salted_group_sum(li, ["l_returnflag"], "l_quantity", 8).collect()
    }
    plain = {
        r.l_returnflag: (round(r.s, 6), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert salted == plain


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof (backward,
    allow_exact_matches=True — the same <= semantics), 500 left rows on
    5 keys with duplicate-free right timestamps per key."""
    import random

    import pandas as pd

    rng = random.Random(7)
    base = 1_700_000_000
    right_rows = []
    seen = set()
    for _ in range(300):
        k = rng.randint(1, 5)
        ts = base + rng.randint(0, 100_000)
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        right_rows.append((k, ts, rng.random()))
    left_rows = [
        (i, rng.randint(1, 5), base + rng.randint(-1000, 101_000))
        for i in range(500)
    ]

    lpdf = pd.DataFrame(left_rows, columns=["lid", "k", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(right_rows, columns=["k", "ts", "px"]).sort_values("ts")
    want_pdf = pd.merge_asof(
        lpdf, rpdf, on="ts", by="k", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.lid): (None if pd.isna(r.px) else round(float(r.px), 9))
        for r in want_pdf.itertuples()
    }

    left = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in left_rows], "lid long, k long, ts long"
    )
    right = spark.createDataFrame(right_rows, "k long, ts long, px double")
    got_df = asof_join(left, right, ["k"], right_cols=["px"], how="left")
    got = {
        int(r.lid): (None if r.matched_px is None else round(r.matched_px, 9))
        for r in got_df.collect()
    }
    assert got == want


def test_asof_nearest_semantics(spark):
    """asof_join_nearest contract: nearest direction wins, ties go to
    prev, equal-instant is a gap-0 prev match, and gaps beyond tolerance
    on BOTH sides drop the row (inner)."""
    from vector_search_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 10:00:00")),  # prev@9:50 (600s) vs next@10:05 (300s) -> next
            (2, 1, _ts("2024-01-01 12:00:00")),  # only next@12:20 within tol -> next
            (3, 2, _ts("2024-01-01 10:00:00")),  # tie: 9:55 vs 10:05 (300s each) -> prev
            (4, 2, _ts("2024-01-01 18:00:00")),  # nothing within 30min -> dropped
            (5, 3, _ts("2024-01-01 10:00:00")),  # equal instant -> prev, gap 0
        ],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:50:00"), 1.0),
            (1, _ts("2024-01-01 10:05:00"), 2.0),
            (1, _ts("2024-01-01 12:20:00"), 3.0),
            (2, _ts("2024-01-01 09:55:00"), 4.0),
            (2, _ts("2024-01-01 10:05:00"), 5.0),
            (3, _ts("2024-01-01 10:00:00"), 6.0),
        ],
        "k long, ts timestamp, px double",
    )
    out = {
        r.lid: (r.dir, r.gap_us, r.matched_px)
        for r in asof_join_nearest(
            left, right, ["k"], right_cols=["px"], tolerance_us=1_800_000_000
        ).collect()
    }
    assert out == {
        1: ("next", 300_000_000, 2.0),
        2: ("next", 1_200_000_000, 3.0),
        3: ("prev", 300_000_000, 4.0),
        5: ("prev", 0, 6.0),
    }


def test_asof_nearest_property_vs_pandas(spark):
    """Random fixture vs pandas merge_asof(direction='nearest') — the
    published semantics this operator reimplements. Timestamps are drawn
    on a grid coarse enough that exact before/after ties cannot occur
    across sides (pandas' tie rule is unspecified; ours is pinned by the
    semantic test above)."""
    import random

    import pandas as pd

    rng = random.Random(77)
    base = 1_700_000_000_000_000
    # left on the even-2s grid, right at +0.7s off that grid: a prev/next
    # gap tie needs left = (o1+o2)*1e6 + 7e5 for integer right offsets
    # o1, o2 — but every left is a multiple of 2e6 and the RHS is 7e5 mod
    # 1e6, so equal gaps (and equal instants) are arithmetically
    # impossible, not just unlikely. (With right at +1s, odd o1+o2 made
    # ties possible — 8 occurred under this seed, silently leaning on
    # pandas' unspecified tie rule.)
    left_rows = [
        (i, rng.randint(1, 5), base + rng.randint(0, 500) * 2_000_000)
        for i in range(120)
    ]
    right_rows = [
        (k, base + off * 2_000_000 + 700_000, float(k) * 10 + off)
        for k in range(1, 6)
        for off in rng.sample(range(500), 60)
    ]
    tol = 9_000_000  # 9s

    lpdf = pd.DataFrame(left_rows, columns=["lid", "k", "tus"]).sort_values("tus")
    rpdf = pd.DataFrame(right_rows, columns=["k", "tus", "px"]).sort_values("tus")
    for df in (lpdf, rpdf):
        df["ts"] = pd.to_datetime(df["tus"], unit="us")
    want_pdf = pd.merge_asof(
        lpdf,
        rpdf[["k", "ts", "px"]],
        on="ts",
        by="k",
        direction="nearest",
        tolerance=pd.Timedelta(microseconds=tol),
    )
    want = {
        int(r.lid): round(float(r.px), 9)
        for r in want_pdf.itertuples()
        if not pd.isna(r.px)
    }

    from vector_search_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(i, k, datetime.utcfromtimestamp(t / 1e6)) for i, k, t in left_rows],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, datetime.utcfromtimestamp(t / 1e6), px) for k, t, px in right_rows],
        "k long, ts timestamp, px double",
    )
    got = {
        int(r.lid): round(r.matched_px, 9)
        for r in asof_join_nearest(
            left, right, ["k"], right_cols=["px"], tolerance_us=tol
        ).collect()
    }
    assert got == want
