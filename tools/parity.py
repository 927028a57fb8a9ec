"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at a given sf dir, then compares row-count, schema shape, and
order-insensitive values (columns sorted by name, rows sorted by all
columns). Exact value equality is required — queries are expected to round
floats in-query, so any residual diff is a real defect.

Usage:  python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    # large-fixture sweeps (10x/100x) bound DuckDB's list-fold memory:
    # SET threads=2 + a spill dir (CLAUDE.md: list-typed operators pin
    # ~GBs per thread and spill does not relieve them)
    threads = os.environ.get("SPARK_GRAFT_DUCK_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    # memory cap + spill dir apply UNCONDITIONALLY (ADVICE r10): DuckDB's
    # default limit assumes 80% of RAM, which a co-resident multi-GB
    # Spark JVM invalidates — a sweep exporting only SPARK_GRAFT_DUCK_MEM
    # must still get the cap, independent of the threads knob
    tmp = os.path.join(REPO, ".scratch", "duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(
        "SET memory_limit='"
        + os.environ.get("SPARK_GRAFT_DUCK_MEM", "40GB")
        + "'"
    )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def compare(name: str, spark_df, con) -> tuple[bool, str]:
    import vector_search_spark  # noqa: F401  (path check)

    # The driver's canonicalizer sorts rows via pandas and dies on
    # array-typed cells (unhashable list). Reject them here so the local
    # replica can never pass what the driver would fail.
    bad = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    if bad:
        return False, f"array/map/struct output columns not gate-safe: {bad}"

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    from vector_search_spark.plans.queries import QUERIES

    res = con.execute(QUERIES[name].oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    sc, sr = canon_rows(s_cols, s_rows)
    dc, dr = canon_rows(d_cols, d_rows)
    if sc != dc:
        return False, f"columns: spark={sc} duck={dc}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            return False, f"row {i} differs:\n  spark={a}\n  duck ={b}"
    return True, f"{len(s_rows)} rows"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from vector_search_spark.plans.queries import QUERIES
    from vector_search_spark.session import get_spark

    import os

    # default 8 matches the driver gate's resource profile; scaled-fixture
    # sweeps (tools/make_scaled_fixtures.py at 10x) set this to 32
    spark = get_spark(
        "parity", cpus=int(os.environ.get("SPARK_GRAFT_PARITY_CPUS", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    # scaled sweeps exclude rows whose PINNED knobs are quadratic at the
    # fixture (band-pinned graph family -> tools/adjudicate_graph_10x.py;
    # zipf hot-block quadratic rows at 100x) — names + reasons documented
    # in SCALING.md per sweep
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_PARITY_SKIP", "").split(",") if s
    }
    import time as _time

    failed = []
    ran = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        if skip and name in skip:
            print(f"SKIP  {name} (SPARK_GRAFT_PARITY_SKIP)")
            continue
        ran += 1
        t0 = _time.perf_counter()
        if spec.oracle is None:
            n = spec.fn(spark, sf_dir).count()
            status = f"ROWS-ONLY ({n} rows)"
            ok = n >= 0
        else:
            try:
                ok, status = compare(name, spec.fn(spark, sf_dir), con)
            except Exception as e:  # noqa: BLE001
                ok, status = False, f"EXCEPTION: {e}"
        el = _time.perf_counter() - t0
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {status} [{el:.1f}s]")
        if not ok:
            failed.append(name)
    print(f"\n{ran - len(failed)}/{ran} pass ({len(QUERIES)} registered)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
