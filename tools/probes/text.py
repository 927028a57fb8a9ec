"""Text-analysis-family probe factories.

Each factory takes its source DataFrame(s) (base or replicated) and
returns a zero-arg runner, exactly as the former tools/scale_probe.py
closures did (round-8 split, no behavior change — see SCALING.md probe
citations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401


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


def bpe(src):
    # t_bpe_train shape: the corpus stage (word-frequency groupBy) is
    # the part that scales; the 8 merge rounds run on the
    # vocabulary-sized state (salted copies grow vocab 10x, rounds
    # stay cheap) — expect ~linear-or-better wall growth.
    from vector_search_spark.operators.lm import bpe_train

    def run():
        return bpe_train(src, "text", k=8).count()

    return run

