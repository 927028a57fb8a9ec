"""GraphDeltaLog — the LSM-style durable publish for graph adjacency
(VERDICT r10 next #1). Pins: fold semantics (latest-delta-wins incl.
zero-row tombstones), the auto-compaction policy, marker atomicity
artifacts (orphan GC), and that delta publishes write O(touched) rows
while base publishes write O(index)."""

import os


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "src_id long, nbr_id long, rank long, score double"
    )


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "src_id long")


def _edges(df):
    return {(r.src_id, r.nbr_id, r.rank, r.score) for r in df.collect()}


def test_fold_latest_wins_and_tombstones(spark, tmp_path):
    from vector_search_spark.operators.graph_delta import GraphDeltaLog

    # frac raised so the tiny fixture's policy never fires — this test
    # pins FOLD semantics only (policy pinned separately below)
    log = GraphDeltaLog(spark, str(tmp_path / "g"), compact_rows_frac=10.0)
    g0 = _df(
        spark,
        [(1, 2, 1, 0.9), (1, 3, 2, 0.8), (2, 1, 1, 0.7), (3, 1, 1, 0.6)],
    )
    assert log.publish(g0, None, -1) == "base"
    # batch 0 replaces src 1's rows and adds src 4
    g1 = _df(
        spark,
        [(1, 4, 1, 0.95), (2, 1, 1, 0.7), (3, 1, 1, 0.6), (4, 1, 1, 0.5)],
    )
    assert log.publish(g1, _ids(spark, [1, 4]), 0) == "delta"
    # batch 1 tombstones src 2 (touched, zero rows in the graph) and
    # re-replaces src 1 — latest delta must win over batch 0's rows
    g2 = _df(spark, [(1, 5, 1, 0.99), (3, 1, 1, 0.6), (4, 1, 1, 0.5)])
    assert log.publish(g2, _ids(spark, [1, 2]), 1) == "delta"
    folded, m = log.recover()
    assert _edges(folded) == _edges(g2)
    assert m["committed"] == 1 and m["base"] == -1 and m["deltas"] == [0, 1]


def test_auto_compaction_folds_deltas_into_base(spark, tmp_path):
    from vector_search_spark.operators.graph_delta import GraphDeltaLog

    log = GraphDeltaLog(spark, str(tmp_path / "g"), max_deltas=2)
    g = _df(spark, [(i, i + 1, 1, 0.5) for i in range(10)])
    log.publish(g, None, -1)
    for b in range(2):
        g = _df(
            spark,
            [(i, i + 1, 1, 0.5) for i in range(10)] + [(100 + b, 0, 1, 0.4)],
        )
        assert log.publish(g, _ids(spark, [100 + b]), b) == "delta"
    # third publish: len(deltas) >= max_deltas → auto base fold
    g = _df(
        spark,
        [(i, i + 1, 1, 0.5) for i in range(10)]
        + [(100, 0, 1, 0.4), (101, 0, 1, 0.4), (102, 0, 1, 0.4)],
    )
    assert log.publish(g, _ids(spark, [102]), 2) == "base"
    m = log.read_marker()
    assert m["base"] == 2 and m["deltas"] == [] and m["delta_rows"] == 0
    # superseded dirs are garbage-collected
    kinds = sorted(
        d for d in os.listdir(str(tmp_path / "g"))
        if d.startswith(("base-", "delta-"))
    )
    assert kinds == ["base-b2"]
    folded, _ = log.recover()
    assert _edges(folded) == _edges(g)


def test_delta_write_is_bounded_by_touched_not_index(spark, tmp_path):
    """The whole point of the delta log: a publish touching 2 of 500
    srcs lands ~2·k rows on disk, not ~500·k."""
    from vector_search_spark.operators.graph_delta import (
        GraphDeltaLog,
        _parquet_num_rows,
    )

    log = GraphDeltaLog(spark, str(tmp_path / "g"))
    base = _df(
        spark,
        [(i, (i + 1) % 500, 1, 0.5) for i in range(500)]
        + [(i, (i + 2) % 500, 2, 0.4) for i in range(500)],
    )
    log.publish(base, None, -1)
    g1 = base.unionByName(_df(spark, [(1000, 1, 1, 0.9), (1001, 2, 1, 0.8)]))
    assert log.publish(g1, _ids(spark, [1000, 1001]), 0) == "delta"
    m = log.read_marker()
    assert m["base_rows"] == 1000
    assert m["delta_rows"] == 2  # the two new srcs' rows ONLY
    d = _parquet_num_rows(
        os.path.join(str(tmp_path / "g"), "delta-b0", "rows")
    )
    assert d == 2
    folded, _ = log.recover()
    assert _edges(folded) == _edges(g1)


def test_orphan_dirs_are_gc_d_and_invisible(spark, tmp_path):
    """A crash mid-write leaves a dir the marker never references —
    recovery must ignore it and the next commit must reap it."""
    from vector_search_spark.operators.graph_delta import GraphDeltaLog

    gdir = str(tmp_path / "g")
    log = GraphDeltaLog(spark, gdir)
    g0 = _df(spark, [(1, 2, 1, 0.9)])
    log.publish(g0, None, -1)
    # orphan from a simulated crash: a delta dir with garbage, no marker
    os.makedirs(os.path.join(gdir, "delta-b7", "rows"), exist_ok=True)
    _df(spark, [(9, 9, 1, 0.1)]).write.mode("overwrite").parquet(
        os.path.join(gdir, "delta-b7", "rows")
    )
    folded, m = log.recover()
    assert _edges(folded) == _edges(g0)  # orphan invisible
    assert m["deltas"] == []
    g1 = _df(spark, [(1, 2, 1, 0.9), (2, 1, 1, 0.8)])
    log.publish(g1, _ids(spark, [2]), 0)
    assert not os.path.exists(os.path.join(gdir, "delta-b7"))  # reaped


def test_crash_between_delta_write_and_marker_rename(spark, tmp_path):
    """Failure injection (VERDICT r11 #3, point 1): the process dies
    AFTER the delta dirs land on disk but BEFORE the ``_LATEST`` rename.
    The commit must be invisible — recovery reads only marker-referenced
    dirs — and the orphaned delta dir must be reaped by the next
    successful commit."""
    from vector_search_spark.operators.graph_delta import GraphDeltaLog

    gdir = str(tmp_path / "g")
    log = GraphDeltaLog(spark, gdir)
    g0 = _df(spark, [(1, 2, 1, 0.9), (2, 1, 1, 0.8)])
    log.publish(g0, None, -1)

    real_write = log._write_marker

    def _boom(m):
        raise RuntimeError("injected crash before marker rename")

    log._write_marker = _boom
    g1 = _df(spark, [(1, 9, 1, 0.99), (2, 1, 1, 0.8)])
    try:
        log.publish(g1, _ids(spark, [1]), 0)
        raise AssertionError("injection did not fire")
    except RuntimeError:
        pass
    # the delta dir was written, but the commit never became visible
    assert os.path.exists(os.path.join(gdir, "delta-b0", "rows"))
    folded, m = log.recover()
    assert _edges(folded) == _edges(g0)  # pre-crash state, exactly
    assert m["committed"] == -1 and m["deltas"] == []

    # next successful commit (a fresh process) reaps the orphan
    log._write_marker = real_write
    g2 = _df(spark, [(1, 2, 1, 0.9), (2, 1, 1, 0.8), (3, 1, 1, 0.7)])
    assert log.publish(g2, _ids(spark, [3]), 1) == "delta"
    assert not os.path.exists(os.path.join(gdir, "delta-b0"))
    folded, m = log.recover()
    assert _edges(folded) == _edges(g2)
    assert m["deltas"] == [1]


def test_crash_between_marker_rename_and_gc(spark, tmp_path):
    """Failure injection (VERDICT r11 #3, point 2): the process dies
    AFTER the ``_LATEST`` rename but BEFORE ``_gc``. The commit is
    durable (recovery sees the new state), superseded dirs linger as
    garbage only, and the next commit reaps them."""
    from vector_search_spark.operators.graph_delta import GraphDeltaLog

    gdir = str(tmp_path / "g")
    log = GraphDeltaLog(spark, gdir)
    g0 = _df(spark, [(1, 2, 1, 0.9), (2, 1, 1, 0.8)])
    log.publish(g0, None, -1)
    g1 = _df(spark, [(1, 9, 1, 0.99), (2, 1, 1, 0.8)])
    assert log.publish(g1, _ids(spark, [1]), 0) == "delta"

    real_gc = log._gc

    def _boom(m):
        raise RuntimeError("injected crash before gc")

    log._gc = _boom
    try:
        log.publish(g1, None, 1)  # touched=None forces a base fold
        raise AssertionError("injection did not fire")
    except RuntimeError:
        pass
    # marker renamed first: the compaction IS committed...
    m = log.read_marker()
    assert m["base"] == 1 and m["deltas"] == []
    folded, _ = log.recover()
    assert _edges(folded) == _edges(g1)
    # ...while the superseded base + delta dirs linger un-reaped
    assert os.path.exists(os.path.join(gdir, "base-b-1"))
    assert os.path.exists(os.path.join(gdir, "delta-b0"))

    # next commit (fresh process) garbage-collects them
    log._gc = real_gc
    g2 = _df(spark, [(1, 9, 1, 0.99), (2, 1, 1, 0.8), (3, 1, 1, 0.7)])
    assert log.publish(g2, _ids(spark, [3]), 2) == "delta"
    assert not os.path.exists(os.path.join(gdir, "base-b-1"))
    assert not os.path.exists(os.path.join(gdir, "delta-b0"))
    folded, _ = log.recover()
    assert _edges(folded) == _edges(g2)
