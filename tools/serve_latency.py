"""Online-ANN-serving latency probe (north-star caveat, quantified).

BASELINE's north star notes that Spark builds indexes in batch while
ONLINE serving usually needs a specialized engine. This probe measures
what serving from Spark actually costs, so the claim is a number, not
folklore: repeated single-probe queries against (a) the PERSISTED
partition-pruned IVF index and (b) a brute-force full-corpus scan, on a
warm local session. Expect an ivf win on scan work but a hard floor of
tens of milliseconds per query from Spark's job scheduling — that floor,
not the scan, is why sub-10ms serving lives in a specialized engine
(or in the per-micro-batch amortized form, s_streaming_knn_serve).

Usage: python tools/serve_latency.py [n_queries]  (env SPARK_GRAFT_SF_DIR)
Prints one JSON line: {"op": "serve_latency", "ivf": {...}, "brute": {...}}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _quantiles(xs):
    s = sorted(xs)
    n = len(s)
    return {
        "p50_ms": round(s[n // 2] * 1000, 1),
        "p95_ms": round(s[min(n - 1, int(n * 0.95))] * 1000, 1),
        "min_ms": round(s[0] * 1000, 1),
    }


def main():
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from vector_search_spark.operators.ann import (
        ivf_assign,
        ivf_build_index,
        ivf_probe_index,
    )
    from vector_search_spark.operators.knn import knn
    from vector_search_spark.session import get_spark
    from vector_search_spark.sources.catalog import load_table, sf_dir_from_env
    from vector_search_spark.utils import pid_scratch

    sf_dir = sf_dir_from_env()
    spark = get_spark("serve_latency")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    # once-per-corpus build job (NOT counted in serve latency)
    path = pid_scratch("serve_latency_ivf", sf_dir)
    t0 = time.perf_counter()
    ivf_build_index(emb, cents, path, assigned=ivf_assign(emb, cents))
    build_s = time.perf_counter() - t0
    cents = cents.localCheckpoint(eager=True)

    probe_rows = emb.filter(F.col("vec_id") < n_q).select(
        "vec_id", "embedding"
    ).collect()

    def one_probe(row):
        return spark.createDataFrame(
            [(row["vec_id"], row["embedding"])],
            "probe_id long, probe_vec array<float>",
        )

    # warm both paths (JIT, parquet footers, broadcast machinery)
    ivf_probe_index(spark, path, cents, one_probe(probe_rows[0]), k=10).collect()
    knn(emb, one_probe(probe_rows[0]), k=10).collect()

    ivf_t, brute_t = [], []
    for row in probe_rows:
        t0 = time.perf_counter()
        # fresh DF per trial: repeated .collect() on one DF reuses shuffle
        # files and lies about latency
        ivf_probe_index(spark, path, cents, one_probe(row), k=10).collect()
        ivf_t.append(time.perf_counter() - t0)
    for row in probe_rows:
        t0 = time.perf_counter()
        knn(emb, one_probe(row), k=10).collect()
        brute_t.append(time.perf_counter() - t0)

    # the Spark-native serving form: amortize the scheduling floor by
    # batching probes into ONE plan — measured through the SHIPPED API
    # (streaming.serving.AnnIndexServer.serve_batch, which
    # s_streaming_knn_serve's per-micro-batch form matches).
    from vector_search_spark.streaming.serving import AnnIndexServer

    server = AnnIndexServer(spark, path, cents, k=10)
    batch_probes = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in probe_rows],
        "probe_id long, probe_vec array<float>",
    )
    t0 = time.perf_counter()
    server.serve_batch(batch_probes).collect()
    batch_s = time.perf_counter() - t0

    # graph-serve (round 8): beam search over the prebuilt k-NN graph,
    # same one-plan-per-batch form. Build (auto band_bits) not counted.
    from vector_search_spark.operators.ann import knn_graph_build, knn_graph_serve

    dim = len(probe_rows[0]["embedding"])
    t0 = time.perf_counter()
    graph = knn_graph_build(emb, k=6, rounds=2, seed=42, dim=dim).localCheckpoint(
        eager=True
    )
    graph_build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    knn_graph_serve(graph, emb, batch_probes, k=10, beam=8, rounds=2).collect()
    graph_batch_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "op": "serve_latency",
                "sf_dir": sf_dir,
                "n_queries": n_q,
                "index_build_s": round(build_s, 2),
                "ivf_single_probe": _quantiles(ivf_t),
                "brute_single_probe": _quantiles(brute_t),
                "ivf_batched": {
                    "total_ms": round(batch_s * 1000, 1),
                    "per_query_ms": round(batch_s * 1000 / n_q, 1),
                },
                "graph_build_s": round(graph_build_s, 2),
                "graph_batched": {
                    "total_ms": round(graph_batch_s * 1000, 1),
                    "per_query_ms": round(graph_batch_s * 1000 / n_q, 1),
                },
            }
        )
    )
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
