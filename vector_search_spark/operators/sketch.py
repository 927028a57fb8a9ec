"""Count-Min sketch — the mergeable COUNT sketch complementing the HLL
cardinality rows (`a_hll_sketch_union`): cells are plain sums, so
map-side combine builds them, SUM merges shards/days/weeks, and the
whole sketch is a ≤ depth×width relation regardless of corpus size.

Hashing is the portable universal family ((key*a + b) mod P) & (w-1)
with pinned constants — deterministic and replayable in any engine, so
the ESTIMATES themselves (not just bounds) cross-check exactly against
a DuckDB replay. Estimates only ever overcount (min over rows of
non-negative cell sums ≥ true count), which the registry row surfaces
as an `over` column the oracle also recomputes.

At 100 TB: the build is one explode(depth) + groupBy over ≤ d·w cells
(map-side combine does almost all the work); serving point estimates is
a broadcast join against the 4096-row cell table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_PRIME = 2_147_483_647  # 2^31 - 1
# (a, b) per depth row — same universal-hash family as the bloom build
CMS_PARAMS = [
    (1_862_270_231, 104_395_303),
    (1_297_337_873, 512_927_357),
    (1_543_871_467, 29_986_577),
    (1_136_930_381, 741_871_103),
]


def _cms_pos(key, a: int, b: int, width: int):
    # Two-fold universal hash (the _bloom_pos_sql pattern): the low 31
    # bits and the high bits are folded separately so NON-NEGATIVE keys up
    # to ~2^60 stay exact — ``key * a`` alone overflows int64 past 2^32.
    # For keys < 2^31 the high term is 0 and positions equal the
    # historical single-fold values (the registry rows' user_id < 2^27
    # domain — and their DuckDB oracle replay — are unchanged).
    a2 = F.lit((a * 40_503) % CMS_PRIME)
    lo = F.pmod(key, F.lit(CMS_PRIME)) * F.lit(a)
    hi = F.shiftright(key, 31) * a2
    return F.pmod(lo + hi + F.lit(b), F.lit(CMS_PRIME)).bitwiseAND(width - 1)


def cms_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(r, c, n) cell sums of the Count-Min sketch over ``key_col``
    occurrences. One explode(depth) + one map-side-combined groupBy; the
    result is a ≤ depth×width relation (broadcastable) and SUM-mergeable
    across any partitioning of the input."""
    key = F.col(key_col)
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cms_pos(key, a, b, width).alias("c"),
                        )
                        for r, (a, b) in enumerate(CMS_PARAMS[:depth])
                    ]
                )
            ).alias("rc")
        )
        .groupBy("rc.r", "rc.c")
        .agg(F.count("*").cast("long").alias("n"))
    )


def cms_estimate(
    cells: DataFrame, probes: DataFrame, key_col: str,
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Point estimates for ``probes[key_col]``: min over depth rows of
    the addressed cells. Cells ride a broadcast; missing cells count 0
    (a key the sketch never saw estimates 0, exact for CMS)."""
    key = F.col(key_col)
    pos = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_pos(key, a, b, width).alias("c"),
                    )
                    for r, (a, b) in enumerate(CMS_PARAMS[:depth])
                ]
            )
        ).alias("rc"),
    ).select(key_col, "rc.r", "rc.c")
    return (
        pos.join(F.broadcast(cells), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("cms_n"))
    )
