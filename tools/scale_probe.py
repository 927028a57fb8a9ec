"""10× scale probe: replicate the sf0.1 fixtures to ~sf1 in-memory and
compare operator runtimes against the sf0.1 baseline.

The point is the RATIO, not the absolute numbers: an operator whose cost
grows ~10× on 10× data is shuffle/partition-safe; super-linear growth
flags a plan that won't survive the next 100×. Text is salted per copy
(every word prefixed with the copy id) so cross-copy shingle overlap is
zero and the dedup queries keep their real output shape instead of
degenerating into all-pairs duplicates; ids are shifted per copy so keys
stay unique.

Usage: python tools/scale_probe.py [n_copies] [probe_name ...]
Writes one JSON line per probe: {"op": ..., "base_s": ..., "scaled_s": ...,
"ratio": ...}. With probe names, runs only those (e.g.
``python tools/scale_probe.py 100 cc_chain`` for the 100x connected-
components probe; ``python tools/scale_probe.py 1 skew_band_join`` for the
AQE skew-split evidence — that probe scales internally and ignores
n_copies).
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


def make_chain_edges(spark, n_chains: int, chain_len: int) -> DataFrame:
    """Adversarial CC input: ``n_chains`` disjoint paths of ``chain_len``
    nodes (edges i→i+1). Diameter = chain_len, so naive label propagation
    needs chain_len rounds; pointer halving should need ~log2(chain_len)."""
    n = n_chains * chain_len
    return (
        spark.range(n)
        .filter((F.col("id") % chain_len) != (chain_len - 1))
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )


def cc_chain_probe(spark, n: int) -> dict:
    """dup_clusters on long-chain graphs, base vs n× chains. The claim under
    test: round count is set by graph DIAMETER (identical at both scales —
    pointer halving ~log2(chain_len)), while wall per round grows with edge
    count. Super-linear round growth would mean the halving is broken."""
    from vector_search_spark.operators.dedup import dup_clusters

    chain_len = 4096  # log2 = 12 → expect ~12-14 rounds
    out = {"op": "cc_chain", "chain_len": chain_len, "copies": n}
    for tag, chains in (("base", 16), ("scaled", 16 * n)):
        edges = make_chain_edges(spark, chains, chain_len)
        stats: dict = {}
        t0 = time.perf_counter()
        got = (
            # driver_max_edges=0: the probe measures the ITERATIVE path —
            # the small-graph union-find fast path would otherwise absorb
            # the base case and break the rounds comparison.
            dup_clusters(edges, max_iterations=30, stats=stats, driver_max_edges=0)
            .select(F.countDistinct("cluster_id").alias("c"))
            .collect()[0]["c"]
        )
        out[f"{tag}_s"] = round(time.perf_counter() - t0, 2)
        out[f"{tag}_rounds"] = stats["rounds"]
        out[f"{tag}_round_wall_s"] = stats["round_wall_s"]
        assert got == chains, f"expected {chains} clusters, got {got}"
    out["ratio"] = round(out["scaled_s"] / max(out["base_s"], 1e-9), 1)
    out["wall_per_round_ratio"] = round(
        (out["scaled_s"] / out["scaled_rounds"])
        / max(out["base_s"] / out["base_rounds"], 1e-9),
        1,
    )
    return out


def _heaviest_stage_task_quantiles(ui_port: int, min_stage_id: int):
    """(stage_id, [min, p50, max] task duration in s) for the completed
    stage with the most executor run time at/after ``min_stage_id`` —
    pulled from the Spark REST API (UI must be enabled)."""
    import urllib.request

    def get(path):
        with urllib.request.urlopen(f"http://localhost:{ui_port}/api/v1{path}") as r:
            return json.load(r)

    app = get("/applications")[0]["id"]
    stages = [
        s
        for s in get(f"/applications/{app}/stages?status=complete")
        if s["stageId"] >= min_stage_id
    ]
    best = max(stages, key=lambda s: s.get("executorRunTime", 0))
    q = get(
        f"/applications/{app}/stages/{best['stageId']}/{best['attemptId']}"
        "/taskSummary?quantiles=0.0,0.5,1.0"
    )
    return best["stageId"], [round(x / 1000.0, 2) for x in q["duration"]]


def _shuffle_write_bytes_since(ui_port: int, min_stage_id: int) -> int:
    """Total shuffle-write bytes across completed stages at/after
    ``min_stage_id`` (REST API; UI must be enabled)."""
    import urllib.request

    def get(path):
        with urllib.request.urlopen(f"http://localhost:{ui_port}/api/v1{path}") as r:
            return json.load(r)

    app = get("/applications")[0]["id"]
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in get(f"/applications/{app}/stages?status=complete")
        if s["stageId"] >= min_stage_id
    )


def span_hash_shuffle_probe(spark, docs_big, ui_port: int, n: int) -> dict:
    """Shuffle-byte evidence for the hash-keyed span dedup: run the
    string-keyed and xxhash64-keyed variants on the same replicated corpus
    and report wall clock + total shuffle-write bytes of each (REST API,
    stage-window per run). Expected: the hashed variant's shuffle payload
    collapses to the fixed-width (hash, id, position) triple — the string
    variant shuffles every 8-word gram."""
    from vector_search_spark.operators.dedup import (
        span_gram_stats,
        span_gram_stats_hashed,
    )

    out = {"op": "span_hash_shuffle", "copies": n}
    for tag, fn in (("string", span_gram_stats), ("hash", span_gram_stats_hashed)):
        marker = _completed_stage_count(ui_port)
        t0 = time.perf_counter()
        n_rows = fn(docs_big, "text", "doc_id", 8).count()
        out[f"{tag}_s"] = round(time.perf_counter() - t0, 2)
        out[f"{tag}_shuffle_mb"] = round(
            _shuffle_write_bytes_since(ui_port, marker) / 1e6, 1
        )
        out[f"{tag}_rows"] = n_rows
    out["shuffle_ratio"] = round(
        out["string_shuffle_mb"] / max(out["hash_shuffle_mb"], 1e-9), 1
    )
    return out


def bigram_smj_probe(spark, docs_big, n: int) -> dict:
    """Proof the bigram-LM score join survives a model too large to
    broadcast: run ``bigram_lm_scores`` on the replicated corpus with
    ``autoBroadcastJoinThreshold=-1`` (models every path as if the
    corpus-derived model outgrew executor memory — the 100 TB reality)
    and assert the executed plan scored via SortMergeJoin, not a
    broadcast. Runs the default-threshold variant too for the wall-clock
    delta, plus the ``min_count``-pruned model path (the bounded
    broadcastable deployment)."""
    from vector_search_spark.operators.lm import bigram_lm_scores

    out = {"op": "bigram_smj", "copies": n}
    conf = spark.conf
    old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for tag, thresh in (("auto", old), ("no_broadcast", "-1")):
            conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
            scored = bigram_lm_scores(docs_big, "text", "doc_id")
            t0 = time.perf_counter()
            n_rows = scored.count()
            out[f"{tag}_s"] = round(time.perf_counter() - t0, 2)
            out[f"{tag}_rows"] = n_rows
            plan = scored._jdf.queryExecution().executedPlan().toString()
            out[f"{tag}_smj"] = "SortMergeJoin" in plan
            out[f"{tag}_bhj"] = "BroadcastHashJoin" in plan
        conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        pruned = bigram_lm_scores(docs_big, "text", "doc_id", min_count=2)
        t0 = time.perf_counter()
        out["pruned_rows"] = pruned.count()
        out["pruned_s"] = round(time.perf_counter() - t0, 2)
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return out


def _completed_stage_count(ui_port: int) -> int:
    import urllib.request

    with urllib.request.urlopen(
        f"http://localhost:{ui_port}/api/v1/applications"
    ) as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"http://localhost:{ui_port}/api/v1/applications/{app}/stages"
    ) as r:
        stages = json.load(r)
    return 1 + max((s["stageId"] for s in stages), default=-1)


def skew_band_join_probe(spark, ui_port: int) -> dict:
    """AQE skew-split evidence on the LSH bucket-probe join shape: a banded
    corpus with one pathologically hot band key (the hot-bucket case a real
    100 TB dedup hits) joined to the per-bucket representative table —
    assign-to-representative, the non-quadratic half of candidate
    generation (the quadratic half is what ``max_block_size`` LSH-degrades).

    Forces sort-merge (no broadcast) so the hot key lands in one shuffle
    partition, runs the join with AQE skew-join OFF then ON, and reports
    wall clock, whether the executed plan shows ``skew=true``, and the
    [min, p50, max] task durations of the heaviest stage from the REST API.
    Expected: ON splits the hot partition, max task duration and the
    max/median spread collapse."""
    n_rows, n_buckets, hot_rows = 3_000_000, 50_000, 1_000_000
    corpus = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < hot_rows, F.lit(-1))
            .otherwise(F.col("id") % n_buckets)
            .alias("band_key"),
            # ~120B payload so the hot partition crosses the skew threshold
            F.repeat(F.md5(F.col("id").cast("string")), 4).alias("sig"),
        )
    )
    reps = (
        spark.range(n_buckets)
        .select(F.col("id").alias("band_key"), F.col("id").alias("rep_doc"))
        .union(spark.sql("SELECT -1L AS band_key, -1L AS rep_doc"))
    )

    def run():
        joined = corpus.join(reps, "band_key").select(
            F.sum(F.length("sig") + F.col("rep_doc")).alias("chk")
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        return "skew=true" in plan

    out = {"op": "skew_band_join", "rows": n_rows, "hot_rows": hot_rows}
    conf = spark.conf
    old_bcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for tag, enabled in (("off", "false"), ("on", "true")):
            conf.set("spark.sql.adaptive.skewJoin.enabled", enabled)
            marker = _completed_stage_count(ui_port)
            t0 = time.perf_counter()
            skewed_plan = run()
            out[f"{tag}_s"] = round(time.perf_counter() - t0, 2)
            out[f"{tag}_skew_in_plan"] = skewed_plan
            stage, quant = _heaviest_stage_task_quantiles(ui_port, marker)
            out[f"{tag}_stage"] = stage
            out[f"{tag}_task_s_min_p50_max"] = quant
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    return out


UI_PORT = 4050


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])
    from vector_search_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs
    from vector_search_spark.operators.knn import knn
    from vector_search_spark.operators.asof import asof_join
    from vector_search_spark.session import cpu_count, get_spark
    from vector_search_spark.sources.catalog import load_table

    want_skew = not only or "skew_band_join" in only
    want_span = not only or "span_hash_shuffle" in only
    if want_skew or want_span:
        # skew probe reads per-task durations from the REST API → needs the
        # UI; thresholds lowered so a ~60 MB hot partition counts as skewed
        # (prod default 256 MB — same mechanism, probe-sized data).
        from pyspark.sql import SparkSession

        (
            SparkSession.builder.appName("scale_probe")
            .master(f"local[{cpu_count()}]")
            .config("spark.sql.shuffle.partitions", str(cpu_count()))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "8m",
            )
            .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.driver.memory", "8g")
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", str(UI_PORT))
            .getOrCreate()
        )
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    if only and only <= {"cc_chain", "skew_band_join"}:
        # pure-synthetic probes: skip fixture loading entirely
        if "cc_chain" in only:
            print(json.dumps(cc_chain_probe(spark, n)))
        if "skew_band_join" in only:
            print(json.dumps(skew_band_join_probe(spark, UI_PORT)))
        spark.stop()
        return

    li = load_table(spark, SF_DIR, "lineitem")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    ev = load_table(spark, SF_DIR, "events")

    li_big = replicate_ids(li, ["l_orderkey"], n, 10_000_000)
    docs_big = replicate_docs(docs, n, 1_000_000)
    emb_big = replicate_ids(emb, ["vec_id"], n, 1_000_000)
    ev_big = replicate_ids(ev, ["event_id", "user_id"], n, 10_000_000)
    li_orders = load_table(spark, SF_DIR, "orders")
    li_orders_big = replicate_ids(li_orders, ["o_orderkey"], n, 10_000_000)

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

    def sessionize(src):
        # w_sessionize_events shape: ONE shuffle on user_id feeds both
        # window passes and the session aggregate. Replication multiplies
        # users (ids shifted), so per-user work is constant — linear class.
        from pyspark.sql import Window

        def run():
            ev2 = src.select(
                "user_id", F.unix_micros("ts").alias("tus"), "event_id", "value"
            )
            w = Window.partitionBy("user_id").orderBy("tus", "event_id")
            brk = F.when(
                F.lag("tus").over(w).isNull()
                | (F.col("tus") - F.lag("tus").over(w) > 1_800_000_000),
                1,
            ).otherwise(0)
            s = ev2.withColumn("brk", brk).withColumn(
                "sid",
                F.sum("brk").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            return (
                s.groupBy("user_id", "sid")
                .agg(F.count("*").alias("n_events"), F.sum("value"))
                .count()
            )

        return run

    def tfidf(src):
        # t_tfidf_terms shape: token explode shuffles once into (source,
        # term) groups; df/top-k are windows over the small grouped set.
        # Salted copies grow the vocabulary 10x — the grouped relation
        # scales with the data, the plan shape must not change.
        from pyspark.sql import Window

        def run():
            tok = src.select("source", F.explode(F.split("text", " ")).alias("term"))
            tf = tok.groupBy("source", "term").agg(F.count("*").alias("tf"))
            d = tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
            ns = src.agg(F.countDistinct("source").alias("n"))
            s = d.join(F.broadcast(ns)).withColumn(
                "score",
                F.col("tf")
                * (F.log((1.0 + F.col("n")) / (1.0 + F.col("df"))) + 1.0),
            )
            w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
            return (
                s.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 5)
                .count()
            )

        return run

    def quantized_knn(src):
        # v_quantized_knn shape: one auxiliary scan for the scale scalar +
        # probes, one scoring scan (broadcast probes, integer dot). Cost is
        # one corpus pass per run — linear class.
        from pyspark.sql import Window

        def run():
            e2 = src.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            )
            aux = e2.agg(
                F.max(F.array_max(F.transform("e", lambda x: F.abs(x)))).alias("m"),
                F.collect_list(
                    F.when(F.col("vec_id") < 3, F.struct("vec_id", "e"))
                ).alias("probes"),
            ).collect()[0]
            m = aux["m"]

            def _quant(col):
                return F.transform(
                    col, lambda x: F.round(x * 127.0 / F.lit(m), 0).cast("long")
                )

            spark = src.sparkSession
            p = spark.createDataFrame(
                [(r["vec_id"], r["e"]) for r in aux["probes"]],
                "probe_id long, pe array<double>",
            ).select("probe_id", _quant("pe").alias("pv"))
            q = e2.select("vec_id", _quant("e").alias("qv"))
            qdot = F.aggregate(
                F.zip_with("qv", "pv", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            d = q.join(F.broadcast(p)).select("probe_id", "vec_id", qdot.alias("qdot"))
            w = Window.partitionBy("probe_id").orderBy(F.desc("qdot"), F.asc("vec_id"))
            return (
                d.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 10)
                .count()
            )

        return run

    def rag_embed(src):
        # pipe_rag_retrieval shape: Catalyst chunking -> Arrow mapInPandas
        # embedding -> broadcast-probe scoring. Cost is one corpus pass
        # through the Python embed stage — the fan_out + Arrow batch class.
        from pyspark.sql import Window

        from vector_search_spark.functions.vector import cosine_sim
        from vector_search_spark.llm.embed import embed_texts

        def run():
            d2 = src.select("doc_id", F.split("text", " ").alias("toks"))
            n_chunks = (F.ceil(F.size("toks") / F.lit(40.0))).cast("int")
            chunks = (
                d2.withColumn(
                    "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
                )
                .withColumn("ck", F.slice("toks", F.col("chunk_id") * 40 + 1, 50))
                .select("doc_id", "chunk_id", F.array_join("ck", " ").alias("chunk_text"))
            )
            cemb = embed_texts(chunks, "chunk_text").select(
                "doc_id", "chunk_id", "embedding"
            )
            queries = d2.filter(F.col("doc_id") < 2).select(
                F.col("doc_id").alias("query_id"),
                F.array_join(F.slice("toks", 1, 30), " ").alias("qtext"),
            )
            qemb = embed_texts(queries, "qtext").select(
                "query_id", F.col("embedding").alias("qv")
            )
            sc = cemb.join(F.broadcast(qemb), cemb.doc_id != qemb.query_id).withColumn(
                "score", cosine_sim("embedding", "qv")
            )
            w = Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("doc_id"), F.asc("chunk_id")
            )
            return (
                sc.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 3)
                .count()
            )

        return run

    def bm25(src):
        # t_bm25_topk shape: token explode -> 5 query terms collected
        # (O(1) driver boundary) -> shared bm25_scaled_contrib (pushed-down
        # isin slice) -> per-doc aggregation. Salted copies multiply docs
        # AND shift the vocabulary; the slice stays O(5 terms x
        # docs-containing-them) — linear class.
        from vector_search_spark.operators.lm import bm25_scaled_contrib

        def run():
            d2 = src.select("doc_id", F.split("text", " ").alias("toks"))
            qt = [
                r["term"]
                for r in d2.select(F.explode("toks").alias("term"))
                .groupBy("term")
                .agg(F.count("*").alias("n_occ"))
                .orderBy(F.desc("n_occ"), F.asc("term"))
                .limit(5)
                .collect()
            ]
            sc = bm25_scaled_contrib(d2, qt)
            return (
                sc.groupBy("doc_id")
                .agg(F.count("*").alias("nq"), F.sum("ci").alias("ci"))
                .orderBy(F.desc("ci"), F.asc("doc_id"))
                .limit(20)
                .count()
            )

        return run

    def containment(src):
        # d_containment_pairs shape: same band shuffle as minhash_lsh, plus
        # the two-direction containment re-rank on banded candidates.
        # Salting keeps cross-copy candidates at zero, so candidate count
        # scales with the data, not its square.
        from vector_search_spark.operators.dedup import containment_pairs

        return lambda: containment_pairs(
            src, "text", "doc_id", 16, 4, 0.6, shingle_n=3
        ).collect()

    def pq_adc(src):
        # v_pq_adc_knn shape: one aux scan (codebook seed vectors), one
        # Arrow pq_encode pass checkpointed as the codes relation, then a
        # codes-only ADC scoring scan. Encode is the dominant cost and is
        # one corpus pass — linear class.
        from pyspark.sql import Window

        from vector_search_spark.operators.ann import pq_encode
        from vector_search_spark.utils import fan_out

        def run():
            e2 = src.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            )
            aux = {
                r["vec_id"]: r["e"]
                for r in e2.filter(F.col("vec_id") < 16).collect()
            }
            codebook = {
                s: {c: aux[c][s * 16:(s + 1) * 16] for c in sorted(aux)}
                for s in range(4)
            }
            enc = pq_encode(fan_out(e2), codebook, corpus_vec="e").localCheckpoint(
                eager=True
            )
            probe_ids = [i for i in sorted(aux) if i < 3]
            ptab = {
                p: {
                    s: [
                        sum(aux[p][s * 16 + i] * codebook[s][c][i] for i in range(16))
                        for c in range(16)
                    ]
                    for s in range(4)
                }
                for p in probe_ids
            }
            per_probe = F.array(
                *[
                    F.struct(
                        F.lit(p).cast("long").alias("probe_id"),
                        sum(
                            F.element_at(
                                F.array(*[F.lit(v) for v in ptab[p][s]]),
                                F.col(f"code{s}") + 1,
                            )
                            for s in range(4)
                        ).alias("adc"),
                    )
                    for p in probe_ids
                ]
            )
            scored = enc.select("vec_id", F.explode(per_probe).alias("ps")).select(
                "vec_id", F.col("ps.probe_id").alias("probe_id"),
                F.col("ps.adc").alias("adc"),
            )
            w = Window.partitionBy("probe_id").orderBy(
                F.desc("adc"), F.asc("vec_id")
            )
            # NB: no unpersist — DataFrame.unpersist is a cache-manager
            # no-op on a localCheckpoint'ed relation; blocks are freed by
            # the ContextCleaner when the RDD goes out of scope
            return (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 10)
                .count()
            )

        return run

    def cohort(src):
        # w_cohort_retention shape: ONE user_id shuffle feeds the cohort
        # window AND the aggregate; replication multiplies users, so
        # per-user work is constant — linear class.
        from pyspark.sql import Window

        def run():
            ev2 = src.select("user_id", F.date_trunc("day", "ts").alias("day"))
            w = Window.partitionBy("user_id")
            a = ev2.withColumn("cohort", F.min("day").over(w)).withColumn(
                "day_offset", F.datediff(F.col("day"), F.col("cohort")).cast("long")
            )
            return (
                a.groupBy(
                    F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
                    "day_offset",
                )
                .agg(F.countDistinct("user_id").alias("n_users"))
                .count()
            )

        return run

    def twolevel(src):
        # pipe_dedup_twolevel shape: exact-dedup groupBy -> LSH pair
        # pipeline -> CC -> keeper anti-join -> hashed span stats over
        # keepers. Salted copies share no text, shingles, or spans, so
        # every stage scales with the data.
        from pyspark.sql import Window

        from vector_search_spark.operators.dedup import (
            dup_clusters,
            minhash_lsh_pairs,
            span_gram_stats_hashed,
        )

        def run():
            surv = src.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
            pairs = minhash_lsh_pairs(surv, "text", "doc_id", 16, 4, 0.5, shingle_n=3)
            drops = (
                dup_clusters(pairs)
                .join(src.select(F.col("doc_id").alias("id"), "n_chars"), "id")
                .withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("cluster_id").orderBy(
                            F.desc("n_chars"), F.asc("id")
                        )
                    ),
                )
                .filter(F.col("rn") > 1)
                .select("id")
            )
            keepers = surv.join(drops, surv.doc_id == drops.id, "left_anti")
            spans = span_gram_stats_hashed(keepers, "text", "doc_id", 8, min_docs=2)
            return spans.agg(F.count("*"), F.sum("n_occ")).collect()

        return run

    def ivf_pq(src):
        # v_ivf_pq_knn shape: one aux scan + one fused Arrow assign+encode
        # pass (checkpointed codes = the index) + a codes-only filtered ADC
        # serve scan. Linear class like pq_adc.
        from pyspark.sql import Window

        from vector_search_spark.operators.ann import ivf_pq_encode
        from vector_search_spark.utils import fan_out

        def run():
            e2 = src.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            )
            aux = {
                r["vec_id"]: r["e"]
                for r in e2.filter(F.col("vec_id") < 16).collect()
            }
            codebook = {
                s: {c: aux[c][s * 16:(s + 1) * 16] for c in sorted(aux)}
                for s in range(4)
            }
            index = ivf_pq_encode(
                fan_out(e2), codebook, aux, corpus_vec="e"
            ).localCheckpoint(eager=True)
            # no unpersist: see pq_adc note (no-op on localCheckpoint)
            return (
                index.filter(F.col("centroid_id").isin([0, 1, 2, 3]))
                .groupBy("centroid_id")
                .agg(F.count("*"))
                .count()
            )

        return run

    def incr_index(src):
        # pipe_incremental_index shape: one full-outer id join classifies
        # the snapshot, one Arrow embed pass over kept rows. Embed cost
        # scales with rows kept — linear class.
        from vector_search_spark.llm.embed import embed_texts

        def run():
            docs = src.select("doc_id", "text")
            v2 = (
                docs.filter(F.col("doc_id") % 17 != 0)
                .select(
                    "doc_id",
                    F.when(
                        F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" v2"))
                    ).otherwise(F.col("text")).alias("text"),
                )
                .unionByName(
                    docs.filter(F.col("doc_id") % 23 == 0).select(
                        (F.col("doc_id") + 100_000_000).alias("doc_id"), "text"
                    )
                )
            )
            a = docs.select(F.col("doc_id").alias("id1"), F.col("text").alias("t1"))
            b = v2.select(F.col("doc_id").alias("id2"), F.col("text").alias("t2"))
            diff = a.join(b, a.id1 == b.id2, "full_outer").select(
                F.coalesce("id1", "id2").alias("doc_id"),
                F.when(F.col("id1").isNull(), "added")
                .when(F.col("id2").isNull(), "removed")
                .when(F.col("t1") != F.col("t2"), "changed")
                .otherwise("unchanged")
                .alias("class"),
                "t1",
                "t2",
            )
            et = diff.filter(F.col("class") != "removed").select(
                "doc_id",
                "class",
                F.when(
                    F.col("class") == "unchanged", F.concat("t1", F.lit("@v1"))
                ).otherwise(F.concat("t2", F.lit("@v2"))).alias("etext"),
            )
            return embed_texts(et, "etext").groupBy("class").count().collect()

        return run

    def hybrid_rrf(docs_src, emb_src):
        # v_hybrid_rrf shape: one token-explode aggregation sliced by the
        # broadcast query terms (shared bm25_scaled_contrib) + one cosine
        # corpus scan + a full-outer join of two <=20-row rank lists per
        # probe. doc_id/vec_id stay aligned across replication (same
        # stride), so the probe docs exist at both scales.
        from pyspark.sql import Window

        from vector_search_spark.functions.vector import cosine_sim
        from vector_search_spark.operators.lm import bm25_scaled_contrib

        def run():
            d2 = docs_src.select("doc_id", F.split("text", " ").alias("toks"))
            e2 = emb_src.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            )
            probes = e2.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("probe_id"), F.col("e").alias("pv")
            )
            vrank = (
                e2.crossJoin(F.broadcast(probes))
                .withColumn("score", cosine_sim("e", "pv"))
                .withColumn(
                    "rv",
                    F.row_number().over(
                        Window.partitionBy("probe_id").orderBy(
                            F.desc("score"), F.asc("vec_id")
                        )
                    ),
                )
                .filter(F.col("rv") <= 20)
                .select("probe_id", F.col("vec_id").alias("id"), "rv")
            )
            qt = (
                d2.filter(F.col("doc_id") < 3)
                .select(
                    F.col("doc_id").alias("probe_id"),
                    F.explode(F.slice("toks", 1, 5)).alias("term"),
                )
                .distinct()
            )
            ci = bm25_scaled_contrib(d2, qt.select("term").distinct())
            lex = (
                ci.join(F.broadcast(qt), "term")
                .groupBy("probe_id", F.col("doc_id").alias("id"))
                .agg(F.sum("ci").alias("lexs"))
            )
            lrank = (
                lex.withColumn(
                    "rl",
                    F.row_number().over(
                        Window.partitionBy("probe_id").orderBy(
                            F.desc("lexs"), F.asc("id")
                        )
                    ),
                )
                .filter(F.col("rl") <= 20)
                .select(
                    F.col("probe_id").alias("lp"), F.col("id").alias("li"), "rl"
                )
            )
            fused = lrank.join(
                vrank,
                (lrank.lp == vrank.probe_id) & (lrank.li == vrank.id),
                "full_outer",
            ).select(
                F.coalesce("lp", "probe_id").alias("p"),
                F.coalesce("li", "id").alias("i"),
                (
                    F.coalesce(1.0 / (60 + F.col("rl")), F.lit(0.0))
                    + F.coalesce(1.0 / (60 + F.col("rv")), F.lit(0.0))
                ).alias("rrf"),
            )
            w = Window.partitionBy("p").orderBy(F.desc("rrf"), F.asc("i"))
            return (
                fused.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 10)
                .count()
            )

        return run


    def bloom_decon(src):
        # d_decontaminate_bloom shape: bloom build is O(eval set) and the
        # eval set (doc_id < 20, original ids only) is FIXED across scales
        # while the corpus replicates 10x — the decontamination story at
        # 100 TB. Map-side bit-test prefilter, then exact verify join over
        # the surviving candidates only. Linear class: one corpus shingle
        # pass + a candidate-sized shuffle.
        from vector_search_spark.functions.text import word_shingle_hashes
        from vector_search_spark.operators.dedup import bloom_build, bloom_member
        from vector_search_spark.utils import fan_out

        def run():
            sh = lambda df: df.select(
                "doc_id", F.explode(word_shingle_hashes("text", 3)).alias("h")
            )
            bench = sh(src.filter(F.col("doc_id") < 20)).select("h").distinct()
            bloom_row, m_bits, k = bloom_build(bench, "h")
            corpus = sh(fan_out(src.filter(F.col("doc_id") >= 20)))
            cand = corpus.crossJoin(F.broadcast(bloom_row)).filter(
                bloom_member("h", m_bits, k)
            )
            return (
                cand.join(F.broadcast(bench), "h")
                .groupBy("doc_id")
                .agg(F.countDistinct("h"))
                .count()
            )

        return run

    def mmr_rerank(src):
        # v_mmr_rerank shape: candidate generation (broadcast probes over
        # the corpus scan + per-probe top-10 window) dominates; the Python
        # MMR stage touches 10 rows per probe regardless of corpus size —
        # the probe verifies the rerank stays O(probes), not O(corpus).
        from pyspark.sql import Window

        from vector_search_spark.functions.vector import cosine_sim

        def run():
            e2 = src.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            )
            probes = e2.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("probe_id"), F.col("e").alias("pv")
            )
            w = Window.partitionBy("probe_id").orderBy(
                F.desc("rel"), F.asc("vec_id")
            )
            cands = (
                e2.crossJoin(F.broadcast(probes))
                .withColumn("rel", cosine_sim("e", "pv"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 10)
                .select("probe_id", "vec_id", "rel", "e")
            )

            def mmr(pdf):
                import numpy as np
                import pandas as pd

                pdf = pdf.sort_values("vec_id").reset_index(drop=True)
                X = np.array(pdf["e"].tolist(), dtype=np.float64)
                nrm = np.sqrt((X * X).sum(axis=1))
                S = (X @ X.T) / np.outer(nrm, nrm)
                rel = pdf["rel"].to_numpy()
                sel = []
                for rank in range(1, 6):
                    best, best_s = None, None
                    for i in range(len(pdf)):
                        if i in sel:
                            continue
                        ms = max((S[i, j] for j in sel), default=0.0)
                        sc = 0.7 * rel[i] - 0.3 * ms
                        if best is None or sc > best_s:
                            best, best_s = i, sc
                    if best is None:
                        break
                    sel.append(best)
                return pd.DataFrame(
                    {"probe_id": pdf["probe_id"][:1], "n_sel": [len(sel)]}
                )

            return (
                cands.groupBy("probe_id")
                .applyInPandas(mmr, "probe_id long, n_sel long")
                .count()
            )

        return run

    def retrieval_ndcg(src):
        # v_retrieval_ndcg shape: exact ground-truth pass + starved-IVF
        # system pass (assign = one more corpus scan) + bounded rank-list
        # join/fold. ~2 corpus passes — linear class.
        from pyspark.sql import Window

        from vector_search_spark.functions.vector import cosine_sim

        def run():
            e2 = src.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            )
            probes = e2.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("probe_id"), F.col("e").alias("pv")
            )
            wex = Window.partitionBy("probe_id").orderBy(
                F.desc("score"), F.asc("vec_id")
            )
            exact = (
                e2.crossJoin(F.broadcast(probes))
                .withColumn("score", cosine_sim("e", "pv"))
                .withColumn("rn", F.row_number().over(wex))
                .filter(F.col("rn") <= 10)
                .select(
                    F.col("probe_id").alias("xp"),
                    F.col("vec_id").alias("xv"),
                    F.col("rn").alias("xr"),
                )
            )
            cents = e2.filter(F.col("vec_id") < 16).select(
                F.col("vec_id").alias("ctid"), F.col("e").alias("cv")
            )
            wc = Window.partitionBy("vec_id").orderBy(
                F.desc("cs"), F.asc("ctid")
            )
            assigned = (
                e2.crossJoin(F.broadcast(cents))
                .withColumn("cs", cosine_sim("e", "cv"))
                .withColumn("crn", F.row_number().over(wc))
                .filter(F.col("crn") == 1)
                .select("vec_id", "e", "ctid")
            )
            wp = Window.partitionBy("probe_id").orderBy(
                F.desc("cs"), F.asc("ctid")
            )
            pcent = (
                probes.crossJoin(F.broadcast(cents))
                .withColumn("cs", cosine_sim("pv", "cv"))
                .withColumn("crn", F.row_number().over(wp))
                .filter(F.col("crn") <= 2)
                .select("probe_id", "pv", "ctid")
            )
            wsys = Window.partitionBy("probe_id").orderBy(
                F.desc("s"), F.asc("vec_id")
            )
            sysr = (
                assigned.join(F.broadcast(pcent), "ctid")
                .withColumn("s", cosine_sim("e", "pv"))
                .withColumn("rn", F.row_number().over(wsys))
                .filter(F.col("rn") <= 10)
                .select("probe_id", "vec_id", "rn")
            )
            return (
                sysr.join(
                    exact,
                    (sysr.probe_id == exact.xp) & (sysr.vec_id == exact.xv),
                    "left",
                )
                .groupBy("probe_id")
                .agg(F.count("xv").alias("hits"))
                .count()
            )

        return run

    def hard_negatives(src):
        # pipe_hard_negatives shape: one broadcast-anchor scored corpus
        # pass, two windows over the same per-anchor partitioning.
        from pyspark.sql import Window

        from vector_search_spark.functions.vector import cosine_sim

        def run():
            e2 = src.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("e"),
                "label",
            )
            anchors = e2.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("anchor_id"),
                F.col("e").alias("pv"),
                F.col("label").alias("plabel"),
            )
            scored = (
                e2.crossJoin(F.broadcast(anchors))
                .filter(F.col("vec_id") != F.col("anchor_id"))
                .withColumn("sim", cosine_sim("e", "pv"))
                .select("anchor_id", "vec_id", "label", "plabel", "sim")
            )
            wneg = Window.partitionBy("anchor_id").orderBy(
                F.desc("sim"), F.asc("vec_id")
            )
            wpos = Window.partitionBy("anchor_id").orderBy(
                F.asc("sim"), F.asc("vec_id")
            )
            negs = (
                scored.filter(F.col("label") != F.col("plabel"))
                .withColumn("rank", F.row_number().over(wneg))
                .filter(F.col("rank") <= 3)
            )
            pos = (
                scored.filter(F.col("label") == F.col("plabel"))
                .withColumn("rank", F.row_number().over(wpos))
                .filter(F.col("rank") <= 1)
            )
            return negs.select("anchor_id", "vec_id").unionAll(
                pos.select("anchor_id", "vec_id")
            ).count()

        return run

    def cross_encoder(docs_src, emb_src):
        # pipe_rerank_cross_encoder shape: bi-encoder corpus pass, then the
        # JVM md5 pair scorer over 10 pairs/query — rerank cost constant.
        from pyspark.sql import Window

        from vector_search_spark.functions.vector import cosine_sim

        def run():
            e2 = emb_src.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            )
            d2 = docs_src.select("doc_id", "text")
            qv = e2.filter(F.col("vec_id") < 2).select(
                F.col("vec_id").alias("query_id"), F.col("e").alias("pv")
            )
            wbi = Window.partitionBy("query_id").orderBy(
                F.desc("sim"), F.asc("vec_id")
            )
            cand = (
                e2.crossJoin(F.broadcast(qv))
                .filter(F.col("vec_id") != F.col("query_id"))
                .withColumn("sim", cosine_sim("e", "pv"))
                .withColumn("bi_rank", F.row_number().over(wbi))
                .filter(F.col("bi_rank") <= 10)
                .select("query_id", "vec_id", "bi_rank")
            )
            qt = d2.filter(F.col("doc_id") < 2).select(
                F.col("doc_id").alias("q_id"), F.col("text").alias("qtext")
            )
            pairs = (
                cand.join(F.broadcast(qt), cand.query_id == qt.q_id)
                .join(d2, cand.vec_id == d2.doc_id)
                .select(
                    "query_id",
                    "vec_id",
                    F.concat(
                        F.col("qtext"), F.lit(" [SEP] "), F.col("text"),
                        F.lit("#0"),
                    ).alias("pair_text"),
                )
            )
            ce = (
                F.conv(F.substring(F.md5("pair_text"), 1, 16), 16, 10)
                .cast("decimal(20,0)")
                .cast("double")
                / 9223372036854775808.0
            )
            wce = Window.partitionBy("query_id").orderBy(
                F.desc("ce"), F.asc("vec_id")
            )
            return (
                pairs.withColumn("ce", ce)
                .withColumn("rn", F.row_number().over(wce))
                .count()
            )

        return run

    def data_mixture(src):
        # pipe_data_mixture shape: lang groupBy + tiny broadcast mixture
        # table + map-side hash-sample predicate. One shuffle on lang.
        from vector_search_spark.functions.text import poly_hash

        def run():
            d2 = src.select("doc_id", "lang")
            counts = d2.groupBy("lang").agg(F.count("*").alias("n"))
            stats = counts.agg(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.sqrt(F.col("n").cast("double")))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("denom"),
                F.sum("n").alias("t"),
            )
            w = F.sqrt(F.col("n").cast("double")) / F.col("denom")
            m = counts.crossJoin(F.broadcast(stats)).select(
                "lang",
                "n",
                F.round(w * F.col("t"), 0).cast("long").alias("target"),
            )
            r = m.withColumn(
                "rate",
                F.least(
                    F.lit(1.0), F.col("target").cast("double") / F.col("n")
                ),
            )
            keep = (poly_hash(F.col("doc_id").cast("string")) % 1000000) < (
                F.col("rate") * 1000000.0
            )
            return (
                d2.join(F.broadcast(r.select("lang", "rate")), "lang")
                .filter(keep)
                .groupBy("lang")
                .agg(F.count("*"))
                .count()
            )

        return run

    def percentiles(src):
        # a_percentiles_by_group shape: per-group exact disc percentiles
        # (sort within 5 lang groups) + the one-pass approx sketch.
        def run():
            return (
                src.groupBy("lang")
                .agg(
                    F.expr("percentile(n_chars, array(0.5, 0.9, 0.99))"),
                    F.expr("approx_percentile(n_chars, 0.5, 10000)"),
                    F.count("*"),
                )
                .count()
            )

        return run


    def hamming_knn(src):
        # v_hamming_binary_knn shape: one corpus scan packs sign bits and
        # xor/popcounts against 3 broadcast probe signatures — pure JVM
        # integer codegen, linear by construction.
        from pyspark.sql import Window

        def run():
            e2 = src.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            )

            def pack(lo, hi):
                return F.aggregate(
                    F.sequence(F.lit(lo), F.lit(hi)),
                    F.lit(0).cast("long"),
                    lambda acc, i: acc * 2
                    + F.when(F.element_at("e", i) > 0, 1).otherwise(0),
                )

            sg = e2.select(
                "vec_id", pack(1, 32).alias("lo"), pack(33, 64).alias("hi")
            )
            probes = sg.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("probe_id"),
                F.col("lo").alias("plo"),
                F.col("hi").alias("phi"),
            )
            w = Window.partitionBy("probe_id").orderBy("hamming", "vec_id")
            return (
                sg.crossJoin(F.broadcast(probes))
                .select(
                    "probe_id",
                    "vec_id",
                    (
                        F.bit_count(F.col("lo").bitwiseXOR(F.col("plo")))
                        + F.bit_count(F.col("hi").bitwiseXOR(F.col("phi")))
                    ).alias("hamming"),
                )
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 10)
                .count()
            )

        return run

    def temporal_join(src):
        # j_temporal_bucket_join shape: 3-bin explode on the probe side,
        # equi-join on (user, bin), residual band filter. Replication
        # multiplies users (ids shifted) so bin population per user is
        # constant — linear class.
        def run():
            gap = 1_800_000_000
            p = src.filter(F.col("event_type") == "purchase").select(
                F.col("event_id").alias("pid"),
                "user_id",
                F.unix_micros("ts").alias("tp"),
            )
            v = src.filter(F.col("event_type") == "view").select(
                F.col("user_id").alias("vu"),
                F.unix_micros("ts").alias("tv"),
                (F.unix_micros("ts") - (F.unix_micros("ts") % gap)).alias("bin"),
            )
            pb = p.select(
                "pid", "user_id", "tp",
                F.explode(F.array(*[
                    (F.col("tp") - (F.col("tp") % gap) + F.lit(i * gap))
                    for i in (-1, 0, 1)
                ])).alias("bin"),
            )
            return (
                pb.join(v, (pb.user_id == v.vu) & (pb.bin == v.bin))
                .filter(F.abs(F.col("tp") - F.col("tv")) <= gap)
                .groupBy("pid")
                .agg(F.count("*"))
                .count()
            )

        return run

    def dsir(src):
        # t_dsir_weights shape: two feature-count groupBys into a BOUNDED
        # 4096-row weight table, then one explode + broadcast join + per-doc
        # aggregate. Feature table size is constant across scales.
        from vector_search_spark.functions.text import poly_hash

        def run():
            f = src.select(
                "doc_id", "lang", F.explode(F.split("text", " ")).alias("wd")
            ).select(
                "doc_id", "lang", (poly_hash(F.col("wd")) % 4096).alias("feat")
            )
            tc = f.filter(F.col("lang") == "en").groupBy("feat").agg(
                F.count("*").alias("ct")
            )
            cc = f.groupBy("feat").agg(F.count("*").alias("cq"))
            tot = f.agg(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("nt"),
                F.count("*").alias("nq"),
            )
            wt = (
                cc.join(F.broadcast(tc), "feat", "left")
                .crossJoin(F.broadcast(tot))
                .select(
                    "feat",
                    F.round(
                        F.log(
                            ((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                             / (F.col("nt") + 4096))
                            / ((F.col("cq") + 1).cast("double")
                               / (F.col("nq") + 4096))
                        ) * 1e9, 0,
                    ).cast("long").alias("wi"),
                )
            )
            return (
                f.join(F.broadcast(wt), "feat")
                .groupBy("doc_id")
                .agg(F.count("*"), F.sum("wi"))
                .count()
            )

        return run

    def hll_union(src):
        # a_hll_sketch_union shape: per-day sketch agg, per-week union —
        # two shuffles whose row counts are day/week cardinalities.
        def run():
            daily = src.select(
                F.date_trunc("week", "ts").alias("wk"),
                F.date_trunc("day", "ts").alias("dy"),
                "user_id",
            ).groupBy("wk", "dy").agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
            return (
                daily.groupBy("wk")
                .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))"))
                .count()
            )

        return run

    def session_native(src):
        # w_session_window_native shape: one shuffle on user_id, native
        # session merge.
        def run():
            return (
                src.groupBy("user_id", F.session_window("ts", "30 minutes"))
                .agg(F.count("*"), F.sum("value"))
                .count()
            )

        return run

    def incr_refresh(src):
        # r_incr_agg_refresh shape: two partition-pruned scans + algebraic
        # merge of 2x|groups| partial rows.
        def run():
            cut = F.lit("1996-01-01").cast("timestamp")

            def part(df):
                return df.groupBy("o_orderpriority", "o_orderstatus").agg(
                    F.count("*").alias("n"),
                    F.sum(
                        F.round(F.col("o_totalprice") * 100, 0).cast("long")
                    ).alias("c"),
                )

            base = part(src.filter(F.col("o_orderdate") < cut))
            delta = part(src.filter(F.col("o_orderdate") >= cut))
            return (
                base.unionByName(delta)
                .groupBy("o_orderpriority", "o_orderstatus")
                .agg(F.sum("n"), F.sum("c"))
                .count()
            )

        return run


    def mh_persist(src):
        # d_minhash_persist_incr shape: corpus index written once (this IS
        # the build job, so it scales with the corpus); the batch probe is
        # O(batch) + partition-pruned index reads.
        import os

        from vector_search_spark.operators.dedup import (
            minhash_index_write,
            minhash_probe_pairs,
        )
        from vector_search_spark.utils import pid_scratch

        def run():
            corpus = src.filter(F.col("doc_id") % 5 != 0)
            batch = src.filter(F.col("doc_id") % 5 == 0)
            # NOTE: no extra suffix — pid_scratch's dead-pid pruning parses
            # the trailing _<pid> token, so appending anything after it would
            # let another process mistake this dir for a dead one. Base and
            # scaled runs share the path sequentially (mode=overwrite).
            path = pid_scratch("mh_probe_idx", SF_DIR)
            minhash_index_write(corpus, "text", "doc_id", path)
            return minhash_probe_pairs(
                spark, path, batch, "text", "doc_id", 0.5
            ).count()

        return run


    def corpus_build(src):
        # pipe_corpus_build shape: the five-stage manifest chain — every
        # stage shuffles on keys (text window, shingle hash, lang); the
        # eval set (doc_id < 20) is fixed across scales.
        from pyspark.sql import Window

        from vector_search_spark.functions.text import (
            poly_hash,
            word_shingle_hashes,
        )
        from vector_search_spark.utils import fan_out

        def run():
            q = src.filter(
                (F.col("doc_id") >= 20)
                & (F.col("n_chars") >= 200)
                & (F.size(F.split("text", " ")) >= 50)
            ).select("doc_id", "lang", "text")
            d = (
                q.withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("text").orderBy("doc_id")
                    ),
                )
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
            bench = (
                src.filter(F.col("doc_id") < 20)
                .select(F.explode(word_shingle_hashes("text", 3)).alias("h"))
                .distinct()
            )
            sh = fan_out(d.select("doc_id", "text")).select(
                "doc_id", F.explode(word_shingle_hashes("text", 3)).alias("h")
            )
            bad = (
                sh.join(F.broadcast(bench), "h")
                .groupBy("doc_id")
                .agg(F.countDistinct("h").alias("ns"))
                .filter(F.col("ns") >= 3)
                .select("doc_id")
            )
            c = d.join(bad, "doc_id", "left_anti")
            lc = c.groupBy("lang").agg(F.count("*").alias("n"))
            st = lc.agg(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.sqrt(F.col("n").cast("double")))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("denom"),
                F.sum("n").alias("t"),
            )
            r = lc.crossJoin(F.broadcast(st)).select(
                "lang",
                F.least(
                    F.lit(1.0),
                    F.round(
                        F.sqrt(F.col("n").cast("double"))
                        / F.col("denom") * F.col("t"), 0,
                    ).cast("long").cast("double") / F.col("n"),
                ).alias("rate"),
            )
            kept = (
                c.join(F.broadcast(r), "lang")
                .filter(
                    (poly_hash(F.col("doc_id").cast("string")) % 1000000)
                    < F.col("rate") * 1000000.0
                )
                .select(
                    "doc_id", "lang",
                    F.size(F.split("text", " ")).cast("long").alias("n_tok"),
                )
            )
            w = (
                Window.partitionBy("lang")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            return (
                kept.select(
                    "lang", "n_tok",
                    F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("cum"),
                )
                .groupBy("lang", F.floor(F.col("cum") / 2000).alias("sid"))
                .agg(F.count("*"), F.sum("n_tok"))
                .count()
            )

        return run


    def stream_drain(src_path_n):
        # Structured Streaming drain probe: write the (replicated) events
        # to parquet, then drain them through the tumbling-window stream
        # with availableNow — wall time measures streaming THROUGHPUT, the
        # number SCALING.md lacked for the streaming family. State size is
        # bounded by window x type cardinality, so 10x rows should cost
        # ~linear drain time, not superlinear state growth.
        import os
        import uuid

        src, n_copies = src_path_n

        def run():
            base = f"/root/repo/.scratch/stream_drain_{os.getpid()}"
            path = f"{base}/in_{uuid.uuid4().hex[:8]}"
            src.write.mode("overwrite").parquet(path)
            schema = spark.read.parquet(path).schema
            stream = spark.readStream.schema(schema).parquet(path)
            agg = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 hour"), "event_type")
                .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            )
            qn = f"sd_{uuid.uuid4().hex[:8]}"
            q = (
                agg.writeStream.format("memory")
                .queryName(qn)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            out = spark.sql(f"SELECT COUNT(*) FROM {qn}").collect()[0][0]
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            return out

        return run

    def snm_dedup(src):
        # d_sorted_neighborhood shape: ONE block-key shuffle + in-block
        # sort, window pairing (<=2n candidates regardless of block size),
        # hash-set jaccard verify. Salted copies carry distinct word
        # prefixes -> disjoint 16-char blocks; per-block work constant —
        # linear class.
        from pyspark.sql import Window

        from vector_search_spark.functions.text import word_shingle_hashes

        def run():
            d = src.select(
                "doc_id",
                "n_chars",
                F.lower(F.substring("text", 1, 16)).alias("blk"),
                word_shingle_hashes("text", 3).alias("tk"),
            )
            w = Window.partitionBy("blk").orderBy("n_chars", "doc_id")
            s = d.select(
                "doc_id",
                "tk",
                F.lead("doc_id", 1).over(w).alias("id1"),
                F.lead("tk", 1).over(w).alias("tk1"),
                F.lead("doc_id", 2).over(w).alias("id2"),
                F.lead("tk", 2).over(w).alias("tk2"),
            )
            p1 = s.filter(F.col("id1").isNotNull()).select(
                "tk", F.col("tk1").alias("tkb")
            )
            p2 = s.filter(F.col("id2").isNotNull()).select(
                "tk", F.col("tk2").alias("tkb")
            )
            pr = p1.unionByName(p2).select(
                F.size(F.array_intersect("tk", "tkb")).alias("ni"),
                F.size(F.array_union("tk", "tkb")).alias("nu"),
            )
            return pr.filter(
                (F.col("nu") > 0)
                & (F.col("ni").cast("double") / F.col("nu") >= 0.1)
            ).count()

        return run

    def vocab_cov(src):
        # t_vocab_coverage shape: one token groupBy (map-side combine) +
        # TakeOrdered top-50 (per-partition partial top-k); replication
        # grows the vocabulary 10x via the c{i}_ prefixes but per-token
        # work is constant — linear class.
        from pyspark.sql import Window

        def run():
            tok = src.select(F.explode(F.split("text", " ")).alias("tok"))
            c = tok.groupBy("tok").agg(F.count("*").alias("n"))
            tot = c.agg(F.sum("n").alias("t"))
            top = (
                c.orderBy(F.desc("n"), F.asc("tok"))
                .limit(50)
                .withColumn(
                    "rank",
                    F.row_number().over(
                        Window.orderBy(F.desc("n"), F.asc("tok"))
                    ),
                )
            )
            cum = Window.orderBy("rank").rowsBetween(
                Window.unboundedPreceding, 0
            )
            return (
                top.withColumn("cum", F.sum("n").over(cum))
                .crossJoin(F.broadcast(tot))
                .selectExpr("CAST((cum * 1000000) div t AS BIGINT) AS ppm")
                .count()
            )

        return run

    def twa(src):
        # w_time_weighted_avg shape: ONE user_id shuffle feeds the lead
        # window and the scaled-int aggregate; replication multiplies
        # users, per-user segment count constant — linear class.
        from pyspark.sql import Window

        def run():
            e2 = src.select(
                "user_id",
                F.unix_micros("ts").alias("tus"),
                "event_id",
                F.round(F.col("value") * 100).cast("bigint").alias("v100"),
            )
            w = Window.partitionBy("user_id").orderBy("tus", "event_id")
            seg = e2.withColumn(
                "dur", F.lead("tus").over(w) - F.col("tus")
            ).filter(F.col("dur").isNotNull())
            return (
                seg.groupBy("user_id")
                .agg(
                    F.sum("dur").alias("td"),
                    F.sum(F.col("v100") * F.col("dur")).alias("ws"),
                )
                .count()
            )

        return run

    def gap_fill(src):
        # w_gap_fill_interpolate shape: per-user grid generation + union +
        # two IGNORE-NULLS windows over one user_id shuffle; grid side is
        # |users|·days rows. Replication multiplies users — linear class.
        from pyspark.sql import Window

        def run():
            e = src.select(
                "user_id",
                F.unix_micros("ts").alias("tus"),
                "event_id",
                F.round(F.col("value") * 100).cast("bigint").alias("v100"),
            )
            bounds = e.groupBy("user_id").agg(
                F.min("tus").alias("mn"), F.max("tus").alias("mx")
            )
            grid = (
                bounds.select(
                    "user_id",
                    "mn",
                    "mx",
                    F.explode(
                        F.sequence(
                            F.to_date(F.timestamp_micros("mn")),
                            F.to_date(F.timestamp_micros("mx")),
                        )
                    ).alias("day"),
                )
                .select(
                    "user_id",
                    "day",
                    F.unix_micros(F.to_timestamp("day")).alias("tg"),
                    "mn",
                    "mx",
                )
                .filter(
                    (F.col("tg") >= F.col("mn")) & (F.col("tg") <= F.col("mx"))
                )
            )
            evs = e.select(
                "user_id",
                F.col("tus").alias("t"),
                F.lit(0).alias("isg"),
                "event_id",
                "v100",
            )
            grd = grid.select(
                "user_id",
                F.col("tg").alias("t"),
                F.lit(1).alias("isg"),
                F.lit(None).cast("long").alias("event_id"),
                F.lit(None).cast("bigint").alias("v100"),
            )
            u = evs.unionByName(grd)
            wp = (
                Window.partitionBy("user_id")
                .orderBy("t", "isg", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            wn = (
                Window.partitionBy("user_id")
                .orderBy("t", "isg", "event_id")
                .rowsBetween(0, Window.unboundedFollowing)
            )
            ev_t = F.when(F.col("isg") == 0, F.col("t"))
            ev_v = F.when(F.col("isg") == 0, F.col("v100"))
            x = (
                u.withColumn("tp", F.last(ev_t, ignorenulls=True).over(wp))
                .withColumn("vp", F.last(ev_v, ignorenulls=True).over(wp))
                .withColumn("tn", F.first(ev_t, ignorenulls=True).over(wn))
                .withColumn("vn", F.first(ev_v, ignorenulls=True).over(wn))
            )
            return x.filter(
                (F.col("isg") == 1)
                & F.col("tp").isNotNull()
                & (F.col("tn").isNotNull() | (F.col("tp") == F.col("t")))
            ).count()

        return run

    def minhash_est(src):
        # d_minhash_est_error shape: checkpointed sig table, bands-only
        # candidate shuffle, two pair-side joins — same band-join class as
        # minhash_lsh; replication multiplies docs with disjoint vocab so
        # bucket population per band key stays constant.
        from vector_search_spark.functions.text import (
            minhash_perm,
            poly_hash,
            word_shingles,
        )

        def run():
            hashed = src.select(
                F.col("doc_id").alias("id"),
                F.transform(word_shingles("text", 3), poly_hash).alias("hs"),
            )
            sig_bound = F.element_at(
                F.transform(
                    F.array("hs"),
                    lambda full: F.transform(
                        F.sequence(F.lit(0), F.lit(15)),
                        lambda s: F.array_min(
                            F.transform(full, lambda h: minhash_perm(h, s))
                        ),
                    ),
                ),
                1,
            )
            sigs = (
                hashed.filter(F.size("hs") > 0)  # mirror the registry row's
                # empty-shingle guard: all-null sigs would band together
                # and turn the probe superlinear on short-doc fixtures
                .select("id", "hs", sig_bound.alias("sig"))
                .localCheckpoint(eager=True)
            )
            banded = sigs.select(
                "id",
                F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
                "sig",
            ).select(
                "id",
                "band",
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice("sig", F.col("band") * 4 + 1, 4),
                        lambda x: x.cast("string"),
                    ),
                ).alias("key"),
            )
            a = banded.select(F.col("id").alias("id_a"), "band", "key")
            b = banded.select(F.col("id").alias("id_b"), "band", "key")
            cands = (
                a.join(b, ["band", "key"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
            )
            sa = sigs.select(
                F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
            )
            sb = sigs.select(
                F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
            )
            j = cands.join(sa, "id_a").join(sb, "id_b")
            agree = F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda v: v,
                )
            )
            return j.select(agree.alias("agree")).count()

        return run

    def freq_spectrum(src):
        # t_freq_spectrum shape: two map-side-combined groupBys, shuffle
        # rows bounded by vocabulary then by distinct counts — never by
        # corpus size.
        def run():
            c = (
                src.select(F.explode(F.split("text", " ")).alias("tok"))
                .groupBy("tok")
                .agg(F.count("*").alias("n"))
            )
            return (
                c.groupBy("n")
                .agg(F.count("*").alias("n_tokens"))
                .orderBy("n")
                .limit(20)
                .count()
            )

        return run

    def knn_graph(src):
        # v_knn_graph_build shape: banded LSH candidate pairs + 2
        # NN-descent rounds, each exactly re-ranked. band_bits is AUTO
        # (round 8): ceil(log2(n/target)) derived per corpus, so bucket
        # sizes — and with them candidate volume per node — hold
        # ~constant as copies grow; SPARK_GRAFT_KNN_GRAPH_BITS pins a
        # fixed width to reproduce the old fixed-knob ratios.
        import os

        from vector_search_spark.operators.ann import knn_graph_build

        env = os.environ.get("SPARK_GRAFT_KNN_GRAPH_BITS")
        bits = int(env) if env else None

        def run():
            return knn_graph_build(
                src, k=6, band_bits=bits, rounds=2, seed=42, dim=64,
            ).count()

        return run

    def bpe(src):
        # t_bpe_train shape: the corpus stage (word-frequency groupBy) is
        # the part that scales; the 8 merge rounds run on the
        # vocabulary-sized state (salted copies grow vocab 10x, rounds
        # stay cheap) — expect ~linear-or-better wall growth.
        from vector_search_spark.operators.lm import bpe_train

        def run():
            return bpe_train(src, "text", k=8).count()

        return run

    def centroid_drift(src):
        # v_centroid_drift shape: ONE conditional-aggregation pass, 18
        # longs per (label) group — the per-label shuffle is O(labels),
        # constant under replication.
        def run():
            v = F.col("embedding").cast("array<double>")
            e = src.select(
                "label",
                (F.col("vec_id") % 2).alias("snap"),
                *[
                    F.floor(F.element_at(v, i + 1) * 1000000)
                    .cast("bigint")
                    .alias(f"r{i+1}")
                    for i in range(8)
                ],
            )
            aggs = [
                F.count(F.when(F.col("snap") == 0, F.lit(1))).alias("n_a"),
                F.count(F.when(F.col("snap") == 1, F.lit(1))).alias("n_b"),
            ]
            for i in range(8):
                aggs.append(
                    F.sum(F.when(F.col("snap") == 0, F.col(f"r{i+1}"))).alias(
                        f"sa{i+1}"
                    )
                )
                aggs.append(
                    F.sum(F.when(F.col("snap") == 1, F.col(f"r{i+1}"))).alias(
                        f"sb{i+1}"
                    )
                )
            return e.groupBy("label").agg(*aggs).count()

        return run

    def cdc_apply(src):
        # s_cdc_apply shape: three foreachBatch merges, each O(state +
        # batch) with a user_id row_number window; replication multiplies
        # keys AND rows, so total merge work scales with the feed —
        # linear class (per-batch state rewrite is the fixture-scale
        # stand-in for partition-wise MERGE).
        import os
        import shutil
        import tempfile
        import uuid

        from vector_search_spark.streaming.cdc import (
            run_cdc_apply_availablenow,
        )

        def run():
            root = tempfile.mkdtemp(prefix=f"sg_cdcprobe_{uuid.uuid4().hex[:6]}_")
            try:
                in_dir = os.path.join(root, "feed")
                os.makedirs(in_dir)
                # land the (replicated) feed as three day-ranged files,
                # mirroring make_cdc_batches without re-reading fixtures
                import glob as _g

                dom = F.dayofmonth("ts")
                for name, pred, mt in (
                    ("a", dom <= 10, 1_000_000_000),
                    ("b", (dom > 10) & (dom <= 20), 1_000_000_100),
                    ("c", dom > 20, 1_000_000_200),
                ):
                    part = os.path.join(root, f"stage_{name}")
                    src.filter(pred).coalesce(1).write.mode(
                        "overwrite"
                    ).parquet(part)
                    (f,) = _g.glob(os.path.join(part, "part-*.parquet"))
                    dst = os.path.join(in_dir, f"{name}.parquet")
                    shutil.move(f, dst)
                    os.utime(dst, (mt, mt))
                res = run_cdc_apply_availablenow(
                    spark, in_dir, os.path.join(root, "work")
                )
                return res.count()
            finally:
                shutil.rmtree(root, ignore_errors=True)

        return run

    def ohlc(src):
        # w_ohlc_bars shape: two row_number windows + groupBy over ONE
        # (user, day) exchange; replication multiplies users — linear.
        from pyspark.sql import Window

        def run():
            e = src.select(
                "user_id",
                F.unix_micros("ts").alias("tus"),
                "event_id",
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                F.round(F.col("value") * 100).cast("bigint").alias("v100"),
            )
            wa = Window.partitionBy("user_id", "day").orderBy(
                "tus", "event_id"
            )
            wd = Window.partitionBy("user_id", "day").orderBy(
                F.desc("tus"), F.desc("event_id")
            )
            r = e.withColumn("rna", F.row_number().over(wa)).withColumn(
                "rnd", F.row_number().over(wd)
            )
            return (
                r.groupBy("user_id", "day")
                .agg(
                    F.max(F.when(F.col("rna") == 1, F.col("v100"))).alias(
                        "open_c"
                    ),
                    F.max("v100").alias("high_c"),
                    F.min("v100").alias("low_c"),
                    F.max(F.when(F.col("rnd") == 1, F.col("v100"))).alias(
                        "close_c"
                    ),
                    F.sum("v100").alias("volume_c"),
                )
                .count()
            )

        return run

    probes = [
        ("q1_agg", q1(li), q1(li_big)),
        ("knn_topk", topk(emb), topk(emb_big)),
        ("minhash_lsh", minhash(docs), minhash(docs_big)),
        ("jaccard_exact", jacc_exact(docs), jacc_exact(docs_big)),
        ("jaccard_default", jacc_default(docs), jacc_default(docs_big)),
        ("embedding_neardup_exact", neardup_exact(emb), neardup_exact(emb_big)),
        ("embedding_neardup_default", neardup_default(emb), neardup_default(emb_big)),
        ("asof_join", asof(ev), asof(ev_big)),
        ("sessionize", sessionize(ev), sessionize(ev_big)),
        ("tfidf", tfidf(docs), tfidf(docs_big)),
        ("quantized_knn", quantized_knn(emb), quantized_knn(emb_big)),
        ("rag_embed", rag_embed(docs), rag_embed(docs_big)),
        ("bm25_topk", bm25(docs), bm25(docs_big)),
        ("containment_pairs", containment(docs), containment(docs_big)),
        ("pq_adc_knn", pq_adc(emb), pq_adc(emb_big)),
        ("cohort_retention", cohort(ev), cohort(ev_big)),
        ("twolevel_dedup", twolevel(docs), twolevel(docs_big)),
        ("hybrid_rrf", hybrid_rrf(docs, emb), hybrid_rrf(docs_big, emb_big)),
        ("ivf_pq", ivf_pq(emb), ivf_pq(emb_big)),
        ("incremental_index", incr_index(docs), incr_index(docs_big)),
        ("bloom_decon", bloom_decon(docs), bloom_decon(docs_big)),
        ("mmr_rerank", mmr_rerank(emb), mmr_rerank(emb_big)),
        ("retrieval_ndcg", retrieval_ndcg(emb), retrieval_ndcg(emb_big)),
        ("hard_negatives", hard_negatives(emb), hard_negatives(emb_big)),
        ("cross_encoder", cross_encoder(docs, emb),
         cross_encoder(docs_big, emb_big)),
        ("data_mixture", data_mixture(docs), data_mixture(docs_big)),
        ("percentiles", percentiles(docs), percentiles(docs_big)),
        ("hamming_knn", hamming_knn(emb), hamming_knn(emb_big)),
        ("knn_graph", knn_graph(emb), knn_graph(emb_big)),
        ("bpe_train", bpe(docs), bpe(docs_big)),
        ("temporal_join", temporal_join(ev), temporal_join(ev_big)),
        ("dsir", dsir(docs), dsir(docs_big)),
        ("hll_union", hll_union(ev), hll_union(ev_big)),
        ("session_native", session_native(ev), session_native(ev_big)),
        ("incr_refresh", incr_refresh(li_orders), incr_refresh(li_orders_big)),
        ("mh_persist", mh_persist(docs), mh_persist(docs_big)),
        ("corpus_build", corpus_build(docs), corpus_build(docs_big)),
        ("stream_drain", stream_drain((ev, 1)), stream_drain((ev_big, n))),
        ("snm_dedup", snm_dedup(docs), snm_dedup(docs_big)),
        ("vocab_coverage", vocab_cov(docs), vocab_cov(docs_big)),
        ("time_weighted_avg", twa(ev), twa(ev_big)),
        ("gap_fill", gap_fill(ev), gap_fill(ev_big)),
        ("minhash_est", minhash_est(docs), minhash_est(docs_big)),
        ("freq_spectrum", freq_spectrum(docs), freq_spectrum(docs_big)),
        ("centroid_drift", centroid_drift(emb), centroid_drift(emb_big)),
        ("cdc_apply", cdc_apply(ev), cdc_apply(ev_big)),
        ("ohlc_bars", ohlc(ev), ohlc(ev_big)),
    ]
    for name, base, scaled in probes:
        if only and name not in only:
            continue
        b = timed(base)
        s = timed(scaled)
        print(json.dumps({"op": name, "base_s": b, "scaled_s": s,
                          "copies": n, "ratio": round(s / max(b, 1e-9), 1)}))
    if want_span:
        print(json.dumps(span_hash_shuffle_probe(spark, docs_big, UI_PORT, n)))
    if not only or "bigram_smj" in only:
        print(json.dumps(bigram_smj_probe(spark, docs_big, n)))
    if not only or "cc_chain" in only:
        print(json.dumps(cc_chain_probe(spark, n)))
    if want_skew:
        print(json.dumps(skew_band_join_probe(spark, UI_PORT)))
    spark.stop()


if __name__ == "__main__":
    main()
