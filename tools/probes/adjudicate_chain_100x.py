"""100x adjudication for the amplified SemDeDup CHAIN
(``pipe_semantic_dedup_guarded``), round 13.

At the 100x-zipf fixture the r=4 amplified pairs snap the 40k-vector hot
label into ONE cluster (measured: largest component 40,238 of 12,343
clusters), so the row's DuckDB ORACLE — a naive transitive-closure
recursive CTE — needs Σ cluster_size² ≈ 1.6e9 (id, lab) rows and cannot
finish. The ENGINE is fine (checkpointed pointer-halving CC is
O(E log d)); it is the replay that is quadratic. The pairs themselves
ARE value-certified at 100x by the DuckDB gate
(``d_embedding_neardup_amplified`` — identical pair semantics, shared
CTE generator), so this tool closes the remaining gap exactly:

1. run the Spark chain row end-to-end at the fixture;
2. recompute the pairs in DuckDB via the SAME certified
   ``_amplified_pair_ctes`` the gate row replays;
3. derive components + keeper flags driver-side with union-find
   (min-id labeling — the oracle's MIN(lab) semantics, all-integer);
4. compare (cluster_id, vec_id, keep) sets EXACTLY.

All-integer output → no float channel, no canonicalization: set
equality or FAIL. Usage:

    python tools/probes/adjudicate_chain_100x.py [fixture_dir]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def duck_chain(fixture: str) -> set:
    import duckdb

    from vector_search_spark.plans.queries import (
        _GUARD_THRESH,
        _amplified_pair_ctes,
    )

    con = duckdb.connect()
    con.execute("SET threads=8")
    con.execute("SET memory_limit='40GB'")
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{fixture}/embeddings.parquet')"
    )
    t0 = time.time()
    pairs = con.sql(
        f"WITH {_amplified_pair_ctes()} "
        f"SELECT id_a, id_b FROM u WHERE cos >= {_GUARD_THRESH}"
    ).fetchall()
    t_pairs = time.time() - t0

    # min-id union-find over the certified pairs (path-halving)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root IS the oracle's MIN(lab)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = sorted(parent)
    expected = {
        (find(i), i, 1 if find(i) == i else 0) for i in members
    }
    print(
        f"duckdb pairs={len(pairs)} [{t_pairs:.1f}s] "
        f"members={len(members)} "
        f"clusters={sum(1 for c, i, k in expected if k == 1)}"
    )
    return expected


def spark_chain(fixture: str) -> set:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_PARITY_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("adjudicate_chain_100x")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from vector_search_spark.plans.queries import QUERIES

    t0 = time.time()
    rows = QUERIES["pipe_semantic_dedup_guarded"].fn(spark, fixture).collect()
    print(f"spark chain rows={len(rows)} [{time.time() - t0:.1f}s]")
    return {(r.cluster_id, r.vec_id, r.keep) for r in rows}


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sfx100z"
    got = spark_chain(fixture)
    want = duck_chain(fixture)
    if got == want:
        print(
            f"PASS  pipe_semantic_dedup_guarded (adjudicated): "
            f"{len(got)} rows value-exact vs union-find over the "
            f"DuckDB-certified amplified pairs"
        )
    else:
        extra = list(got - want)[:5]
        missing = list(want - got)[:5]
        print(
            f"FAIL  pipe_semantic_dedup_guarded (adjudicated): "
            f"spark={len(got)} expected={len(want)} "
            f"extra={extra} missing={missing}"
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
