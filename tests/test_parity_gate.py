"""Meta-tests for the correctness gate itself: a comparator bug that made
everything pass would invalidate all 175 green rows at once, so pin that
tools/parity.py FAILS on value drift, row-count drift, column drift, and
gate-unsafe array outputs — and passes on genuinely equal results
regardless of row/column order."""

import importlib.util
import os

import pytest


def _parity():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "parity.py")
    spec = importlib.util.spec_from_file_location("parity_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_canon_rows_is_order_insensitive_but_value_sensitive():
    p = _parity()
    cols_a, rows_a = p.canon_rows(["b", "a"], [(2, 1), (4, 3)])
    cols_b, rows_b = p.canon_rows(["a", "b"], [(3, 4), (1, 2)])
    assert cols_a == cols_b and rows_a == rows_b  # permuted cols+rows equal
    _, rows_c = p.canon_rows(["a", "b"], [(1, 2), (3, 5)])  # one value off
    assert rows_c != rows_a


def test_canon_cell_float_precision_and_null():
    p = _parity()
    # 9-significant-digit canonicalization: sub-1e-9 noise collapses,
    # real differences survive, null gets a sentinel distinct from "None"
    assert p.canon_cell(1.0000000001) == p.canon_cell(1.0)
    assert p.canon_cell(1.000001) != p.canon_cell(1.0)
    assert p.canon_cell(None) != p.canon_cell("None")
    assert p.canon_cell(True) == p.canon_cell(1)


@pytest.mark.parametrize(
    "oracle,why",
    [
        ("SELECT 1 AS a, 2 AS b", None),  # control: must PASS
        ("SELECT 1 AS a, 3 AS b", "row 0 differs"),
        ("SELECT 1 AS a, 2 AS b UNION ALL SELECT 1, 2", "row count"),
        ("SELECT 1 AS a, 2 AS wrong", "columns"),
    ],
)
def test_compare_catches_each_drift_class(spark, monkeypatch, oracle, why):
    import duckdb

    p = _parity()
    from vector_search_spark.plans import queries as q

    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    monkeypatch.setitem(
        q.QUERIES, "_gate_meta_probe", q.QuerySpec(fn=None, oracle=oracle)
    )
    ok, msg = p.compare("_gate_meta_probe", df, duckdb.connect())
    if why is None:
        assert ok, msg
    else:
        assert not ok and why in msg, msg


def test_auto_digest_fallback_flips_on_big_oracle(spark, monkeypatch):
    """VERDICT r11 #2: row mode must flip to the in-engine digest compare
    on its own when the oracle output exceeds the size cap — and the
    digest path must still catch value drift."""
    import duckdb

    p = _parity()
    from vector_search_spark.plans import queries as q

    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    monkeypatch.setenv("SPARK_GRAFT_PARITY_AUTO_DIGEST_ROWS", "0")
    monkeypatch.setitem(
        q.QUERIES,
        "_gate_meta_probe",
        q.QuerySpec(fn=None, oracle="SELECT 1 AS a, 2 AS b"),
    )
    ok, msg = p.compare("_gate_meta_probe", df, duckdb.connect())
    assert ok and "auto-digest" in msg, msg
    # drift must still FAIL through the fallback
    monkeypatch.setitem(
        q.QUERIES,
        "_gate_meta_probe",
        q.QuerySpec(fn=None, oracle="SELECT 1 AS a, 3 AS b"),
    )
    ok, msg = p.compare("_gate_meta_probe", df, duckdb.connect())
    assert not ok and "auto-digest" in msg and "digest" in msg, msg


def test_auto_digest_stays_row_mode_below_cap(spark, monkeypatch):
    import duckdb

    p = _parity()
    from vector_search_spark.plans import queries as q

    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    monkeypatch.setitem(
        q.QUERIES,
        "_gate_meta_probe",
        q.QuerySpec(fn=None, oracle="SELECT 1 AS a, 2 AS b"),
    )
    ok, msg = p.compare("_gate_meta_probe", df, duckdb.connect())
    assert ok and "auto-digest" not in msg, msg


def test_compare_rejects_array_outputs(spark, monkeypatch):
    import duckdb

    p = _parity()
    from vector_search_spark.plans import queries as q

    df = spark.createDataFrame([([1, 2],)], "a array<bigint>")
    monkeypatch.setitem(
        q.QUERIES, "_gate_meta_probe", q.QuerySpec(fn=None, oracle="SELECT 1")
    )
    ok, msg = p.compare("_gate_meta_probe", df, duckdb.connect())
    assert not ok and "gate-safe" in msg
