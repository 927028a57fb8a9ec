"""Ingest pipelines (SURVEY §3.3) — the write side of the reference.

``build_campaign_vectors``  = camp_vec_save.py: denormalize entity rows →
sentence-serialize → batch-embed → vector table. One distributed plan; the
reference's per-row INSERT-with-reconnect (camp_vec_save.py:59-79) becomes a
single ``df.write``.

``build_condition_vectors`` = nl_targeting_save.py: condition catalog
(derived from fixture dimension lookups — the S3 dynamic sub-scan analog) →
3 LLM paraphrases per condition (L5) → batch-embed → condition_vec table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.clients import EmbeddingClient, FakeLLMClient, LLMClient
from ..llm.embed import embed_texts
from ..sources.catalog import load_table


def _campaign_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """camp_vec_save.py:6-40 shape: header + lookups + aggregated detail,
    serialized to one Korean sentence per entity (F4)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation_nm")
    )
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
    )
    denorm = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.nk, "left")
        .join(agg, cust.c_custkey == agg.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("camp_id"),
            F.concat(
                F.lit("이름은 "), F.col("c_name"),
                F.lit(" 입니다. 국가는 "),
                F.coalesce("nation_nm", F.lit("없음")),
                F.lit(" 입니다. 세그먼트는 "), F.col("c_mktsegment"),
                F.lit(" 입니다. 주문수는 "),
                F.coalesce(F.col("n_orders"), F.lit(0)).cast("string"),
                F.lit(" 입니다. 상태는 "),
                F.coalesce("statuses", F.lit("없음")),
                F.lit(" 입니다."),
            ).alias("sentence"),
        )
    )
    return denorm


def build_campaign_vectors(
    spark: SparkSession,
    sf_dir: str,
    client: EmbeddingClient | None = None,
    out_path: str | None = None,
) -> DataFrame:
    """camp_summary_vec equivalent: (camp_id, sentence, embedding)."""
    denorm = _campaign_denorm(spark, sf_dir)
    vecs = embed_texts(denorm, "sentence", "embedding", client)
    if out_path:
        vecs.write.mode("overwrite").parquet(out_path)
        return spark.read.parquet(out_path)
    return vecs


def _condition_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nl_targeting_save.py:11-97 analog: a catalog of targeting conditions
    with per-condition code lookups pulled from dimension tables (the S3
    dynamic sub-scan, pre-joined instead of per-row SQL)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    segs = (
        cust.select(F.col("c_mktsegment").alias("code"))
        .distinct()
        .select(
            F.lit("세그먼트").alias("cond_nm"),
            "code",
            F.col("code").alias("code_nm"),
            F.lit("string").alias("cond_type"),
            F.lit("c_mktsegment").alias("column_nm"),
            F.lit("customer").alias("table_nm"),
        )
    )
    nations = nation.select(
        F.lit("국가").alias("cond_nm"),
        F.col("n_nationkey").cast("string").alias("code"),
        F.col("n_name").alias("code_nm"),
        F.lit("string").alias("cond_type"),
        F.lit("c_nationkey").alias("column_nm"),
        F.lit("customer").alias("table_nm"),
    )
    static = spark.createDataFrame(
        [
            ("주문금액", "", "주문 총액", "integer", "o_totalprice", "orders"),
            ("주문일자", "", "주문 일자", "datePopup", "o_orderdate", "orders"),
        ],
        ["cond_nm", "code", "code_nm", "cond_type", "column_nm", "table_nm"],
    )
    cat = reduce(DataFrame.unionByName, [segs, nations, static])
    return cat.withColumn(
        "cond_id",
        F.concat_ws("#", "cond_nm", "code"),
    )


def build_condition_vectors(
    spark: SparkSession,
    sf_dir: str,
    llm: LLMClient | None = None,
    client: EmbeddingClient | None = None,
    n_paraphrases: int = 3,
    out_path: str | None = None,
) -> DataFrame:
    """condition_vec equivalent: one row per (condition, paraphrase) with an
    embedding — the L5 fan-out is an explode, the embedding a mapInPandas."""
    llm = llm or FakeLLMClient()
    cat = _condition_catalog(spark, sf_dir)

    # L5 paraphrase fan-out. The fake client is deterministic and cheap, so
    # the fan-out is expressible as a driver-free explode via a pandas batch.
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    out_schema = StructType(
        [*cat.schema.fields, StructField("paraphrases", ArrayType(StringType()))]
    )

    def add_paraphrases(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["paraphrases"] = [
                llm.paraphrase(a, v, n_paraphrases)
                for a, v in zip(pdf["cond_nm"], pdf["code_nm"])
            ]
            yield pdf

    exploded = (
        cat.mapInPandas(add_paraphrases, out_schema)
        .select("*", F.explode("paraphrases").alias("sentence"))
        .drop("paraphrases")
    )
    vecs = embed_texts(exploded, "sentence", "cond_vec", client)
    if out_path:
        vecs.write.mode("overwrite").parquet(out_path)
        return spark.read.parquet(out_path)
    return vecs
