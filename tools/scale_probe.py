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

from probe_lib import (  # noqa: E402
    completed_stage_count as _completed_stage_count,
    heaviest_stage_task_quantiles as _heaviest_stage_task_quantiles,
    shuffle_write_bytes_since as _shuffle_write_bytes_since,
)

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

    from probes.relational import asof, cdc_apply, cohort, gap_fill, hll_union, incr_refresh, ohlc, percentiles, q1, session_native, sessionize, stream_drain, temporal_join, twa  # noqa: F401
    from probes.dedup import bloom_decon, containment, corpus_build, freq_spectrum, jacc_default, jacc_exact, mh_persist, minhash, minhash_est, neardup_default, neardup_exact, snm_dedup, twolevel  # noqa: F401
    from probes.vector import centroid_drift, cross_encoder, hamming_knn, hard_negatives, hybrid_rrf, incr_index, ivf_pq, knn_graph, mmr_rerank, pq_adc, quantized_knn, rag_embed, retrieval_ndcg, topk  # noqa: F401
    from probes.text import bm25, bpe, data_mixture, dsir, tfidf, vocab_cov  # noqa: F401
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
