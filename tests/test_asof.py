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
