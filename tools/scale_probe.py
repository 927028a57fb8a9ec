"""10× scale probe: replicate the sf0.1 fixtures to ~sf1 in-memory and
compare operator runtimes against the sf0.1 baseline.

The point is the RATIO, not the absolute numbers: an operator whose cost
grows ~10× on 10× data is shuffle/partition-safe; super-linear growth
flags a plan that won't survive the next 100×. Text is salted per copy
(every word prefixed with the copy id) so cross-copy shingle overlap is
zero and the dedup queries keep their real output shape instead of
degenerating into all-pairs duplicates; ids are shifted per copy so keys
stay unique.

Usage: python tools/scale_probe.py [n_copies]
Writes one JSON line per probe: {"op": ..., "base_s": ..., "scaled_s": ...,
"ratio": ...}.
"""

from __future__ import annotations

import json
import sys
import time
from functools import reduce

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicate_ids(df: DataFrame, id_cols: list[str], n: int, stride: int) -> DataFrame:
    copies = []
    for i in range(n):
        c = df
        for col in id_cols:
            c = c.withColumn(col, F.col(col) + i * stride)
        copies.append(c)
    return reduce(DataFrame.unionByName, copies)


def replicate_docs(docs: DataFrame, n: int, stride: int) -> DataFrame:
    copies = []
    for i in range(n):
        copies.append(
            docs.withColumn("doc_id", F.col("doc_id") + i * stride).withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"c{i}_$1")
            )
        )
    return reduce(DataFrame.unionByName, copies)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from vector_search_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs
    from vector_search_spark.operators.knn import knn
    from vector_search_spark.operators.asof import asof_join
    from vector_search_spark.session import get_spark
    from vector_search_spark.sources.catalog import load_table

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    li = load_table(spark, SF_DIR, "lineitem")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    ev = load_table(spark, SF_DIR, "events")

    li_big = replicate_ids(li, ["l_orderkey"], n, 10_000_000)
    docs_big = replicate_docs(docs, n, 1_000_000)
    emb_big = replicate_ids(emb, ["vec_id"], n, 1_000_000)
    ev_big = replicate_ids(ev, ["event_id", "user_id"], n, 10_000_000)

    def q1(src):
        return lambda: src.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")
        ).collect()

    def topk(src):
        probes = emb.filter("vec_id < 5").select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
        )
        return lambda: knn(src, probes, k=10).collect()

    def minhash(src):
        return lambda: minhash_lsh_pairs(src, "text", "doc_id", 16, 4, 0.5, shingle_n=3).collect()

    def jacc_exact(src):
        # explicit exact-everywhere (the Σblock² quadratic class)
        return lambda: jaccard_pairs(
            src, "text", "doc_id", ["source", "lang"], 0.2, shingle_n=3,
            max_block_size=None,
        ).collect()

    def jacc_default(src):
        # DEFAULT arguments — guard at 1000 engages on the 10x blocks
        return lambda: jaccard_pairs(
            src, "text", "doc_id", ["source", "lang"], 0.2, shingle_n=3
        ).collect()

    def neardup_exact(src):
        from vector_search_spark.operators.dedup import embedding_neardup_pairs

        return lambda: embedding_neardup_pairs(
            src, "embedding", "vec_id", "label", 0.8, max_block_size=None
        ).collect()

    def neardup_default(src):
        from vector_search_spark.operators.dedup import embedding_neardup_pairs

        return lambda: embedding_neardup_pairs(
            src, "embedding", "vec_id", "label", 0.8
        ).collect()

    def asof(src):
        p = src.filter("event_type = 'purchase'").select("user_id", "ts", "event_id")
        v = src.filter("event_type = 'view'").select("user_id", "ts", "value")
        return lambda: asof_join(p, v, ["user_id"], right_cols=["value"]).count()

    probes = [
        ("q1_agg", q1(li), q1(li_big)),
        ("knn_topk", topk(emb), topk(emb_big)),
        ("minhash_lsh", minhash(docs), minhash(docs_big)),
        ("jaccard_exact", jacc_exact(docs), jacc_exact(docs_big)),
        ("jaccard_default", jacc_default(docs), jacc_default(docs_big)),
        ("embedding_neardup_exact", neardup_exact(emb), neardup_exact(emb_big)),
        ("embedding_neardup_default", neardup_default(emb), neardup_default(emb_big)),
        ("asof_join", asof(ev), asof(ev_big)),
    ]
    for name, base, scaled in probes:
        b = timed(base)
        s = timed(scaled)
        print(json.dumps({"op": name, "base_s": b, "scaled_s": s,
                          "copies": n, "ratio": round(s / max(b, 1e-9), 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
