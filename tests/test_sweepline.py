"""Property + golden tests for the sweep-line operator (SURVEY §5.2.3).

Invariants checked against a brute-force per-point oracle:
- per name, output segments are non-overlapping and ordered;
- every integer point inside an input interval is covered by exactly one
  output segment whose weight equals the number (sum of weights) of input
  intervals covering that point;
- touching intervals [a,b],[b,c] overlap at b (T3 tie rule,
  camp_vec_rcmn.py:147,171);
- total weighted length is conserved: Σ weight·len(segment) = Σ w·len(interval).
"""

import random

from pyspark.sql import functions as F

from vector_search_spark.operators.sweepline import sweep_overlap, sweep_overlap_dates


def brute_force(intervals):
    """point -> overlap weight, inclusive ends."""
    cover = {}
    for name, s, e, w in intervals:
        for p in range(s, e + 1):
            cover[(name, p)] = cover.get((name, p), 0) + w
    return cover


def run_sweep(spark, intervals):
    df = spark.createDataFrame(intervals, ["name", "start", "end", "w"])
    return sweep_overlap(df, "name", "start", "end", "w").collect()


def check(spark, intervals):
    segs = run_sweep(spark, intervals)
    cover = brute_force(intervals)
    # 1. coverage: every covered point appears in exactly one segment with
    #    matching weight
    seen = {}
    for r in segs:
        assert r.seg_start <= r.seg_end
        for p in range(r.seg_start, r.seg_end + 1):
            assert (r.name, p) not in seen, f"overlap at {(r.name, p)}"
            seen[(r.name, p)] = r.weight
    covered = {k: v for k, v in cover.items() if v > 0}
    assert set(seen) == set(covered)
    for k, w in covered.items():
        assert abs(seen[k] - w) < 1e-9, f"weight mismatch at {k}"


def test_touching_intervals_overlap(spark):
    segs = run_sweep(spark, [("a", 1, 5, 1.0), ("a", 5, 9, 1.0)])
    at5 = [r for r in segs if r.seg_start <= 5 <= r.seg_end]
    assert len(at5) == 1 and at5[0].weight == 2.0
    assert at5[0].seg_start == 5 and at5[0].seg_end == 5


def test_disjoint(spark):
    check(spark, [("a", 1, 3, 1.0), ("a", 10, 12, 2.0)])


def test_nested_and_identical(spark):
    check(
        spark,
        [("a", 1, 100, 1.0), ("a", 10, 20, 1.0), ("a", 10, 20, 3.0),
         ("b", 1, 1, 1.0)],
    )


def test_random_intervals(spark):
    rng = random.Random(42)
    intervals = [
        (
            rng.choice(["a", "b", "c"]),
            (s := rng.randint(0, 60)),
            s + rng.randint(0, 25),
            float(rng.randint(1, 4)),
        )
        for _ in range(60)
    ]
    check(spark, intervals)


def test_weight_conservation(spark):
    rng = random.Random(7)
    intervals = [
        ("x", (s := rng.randint(0, 1000)), s + rng.randint(0, 200), 1.0)
        for _ in range(100)
    ]
    segs = run_sweep(spark, intervals)
    got = sum(r.weight * (r.seg_end - r.seg_start + 1) for r in segs)
    want = sum(w * (e - s + 1) for _, s, e, w in intervals)
    assert abs(got - want) < 1e-6


def test_date_variant(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [
            ("p", dt.date(2024, 1, 1), dt.date(2024, 1, 10)),
            ("p", dt.date(2024, 1, 10), dt.date(2024, 1, 20)),
        ],
        ["name", "start_date", "end_date"],
    )
    segs = {
        (r.seg_start.isoformat(), r.seg_end.isoformat()): r.weight
        for r in sweep_overlap_dates(df).collect()
    }
    assert segs == {
        ("2024-01-01", "2024-01-09"): 1.0,
        ("2024-01-10", "2024-01-10"): 2.0,
        ("2024-01-11", "2024-01-20"): 1.0,
    }


def test_funnel_strict_ordering(spark):
    """The funnel counts only stages that happen strictly AFTER the
    previous stage's first occurrence — a click before the first view
    must not count."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> purchase (full funnel)
        (1, base, "view"), (1, base + dt.timedelta(minutes=1), "click"),
        (1, base + dt.timedelta(minutes=2), "purchase"),
        # user 2: click BEFORE first view -> click must not count
        (2, base, "click"), (2, base + dt.timedelta(minutes=1), "view"),
        # user 3: view then purchase without click -> purchase must not count
        (3, base, "view"), (3, base + dt.timedelta(minutes=1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t_view"))
    c = (ev.filter(F.col("event_type") == "click").join(v, "user_id")
         .filter(F.col("ts") > F.col("t_view")).groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase").join(c, "user_id")
         .filter(F.col("ts") > F.col("t_click")).groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    assert v.count() == 3 and c.count() == 1 and p.count() == 1
