"""Vector/ANN-family probe factories.

Each factory takes its source DataFrame(s) (base or replicated) and
returns a zero-arg runner, exactly as the former tools/scale_probe.py
closures did (round-8 split, no behavior change — see SCALING.md probe
citations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401


def topk(src):
    from vector_search_spark.operators.knn import knn

    # probe set: vec_id < 5 — identical rows whether taken from the base
    # table or a replicated copy (copy 0 keeps base ids; shifts are +1M)
    probes = src.filter("vec_id < 5").select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    return lambda: knn(src, probes, k=10).collect()


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

