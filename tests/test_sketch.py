"""Count-Min sketch contracts: the widened two-fold hash is (a) identical
to the legacy single-fold for narrow keys — the registry rows' oracle
replay domain — and (b) overflow-free for wide keys up to ~2^60, and the
estimator never undercounts."""

import pyspark.sql.functions as F

from vector_search_spark.operators.sketch import (
    CMS_PARAMS,
    CMS_PRIME,
    _cms_pos,
    cms_cells,
    cms_estimate,
)


def test_cms_pos_narrow_matches_legacy_fold(spark):
    keys = [0, 1, 7, 123_456, 2**27 - 1, 2**31 - 2]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    for r, (a, b) in enumerate(CMS_PARAMS):
        got = [
            row[0]
            for row in df.select(
                _cms_pos(F.col("k"), a, b, 1024)
            ).collect()
        ]
        want = [((k * a + b) % CMS_PRIME) & 1023 for k in keys]
        assert got == want, f"depth row {r} diverged on narrow keys"


def test_cms_pos_wide_keys_exact(spark):
    # ~2^59 keys: the single-fold key*a would overflow int64; the widened
    # fold must match an exact big-int replay
    keys = [2**59 - 11, 2**58 + 12345, (1 << 55) | 0x7FFF_FFFF]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    for r, (a, b) in enumerate(CMS_PARAMS):
        a2 = (a * 40_503) % CMS_PRIME
        got = [
            row[0]
            for row in df.select(
                _cms_pos(F.col("k"), a, b, 1024)
            ).collect()
        ]
        want = [
            (((k % CMS_PRIME) * a + (k >> 31) * a2 + b) % CMS_PRIME) & 1023
            for k in keys
        ]
        assert got == want, f"depth row {r} diverged on wide keys"
        assert all(0 <= p < 1024 for p in got)


def test_cms_never_undercounts_wide_domain(spark):
    rows = [(2**59 + (i % 13),) for i in range(200)]
    df = spark.createDataFrame(rows, "k long")
    cells = cms_cells(df, "k")
    exact = df.groupBy("k").agg(F.count("*").alias("exact_n"))
    est = cms_estimate(cells, exact.select("k"), "k")
    joined = exact.join(est, "k").collect()
    assert len(joined) == 13
    assert all(r["cms_n"] >= r["exact_n"] for r in joined)
