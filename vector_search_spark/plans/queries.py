"""Named query registry — the driver correctness surface.

Every operator from SURVEY.md §2 gets a named entry: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB oracle
string over the same parquet views. The driver compares row-count + schema +
order-insensitive value-hash at sf0.01.

Determinism rules applied throughout (SURVEY.md §7.7):
- every float output is wrapped in ``round(..., n)`` on BOTH sides;
- every top-k / window rank has an explicit id tie-break;
- no raw timestamps in outputs — dates are formatted to 'yyyy-MM-dd' strings;
- integer aggregates are cast so Spark LongType == DuckDB BIGINT
  (DuckDB SUM(int) is HUGEINT — always cast in the oracle).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.knn import knn, multiprobe_fusion, threshold_search
from ..sources.catalog import load_table


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible, rows-only check


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _probes(emb: DataFrame, n: int) -> DataFrame:
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )


# ---------------------------------------------------------------------------
# Vector family (SURVEY §2.9: V1-V5, T1/W2, A1, P3)
# ---------------------------------------------------------------------------


@register(
    "v_cosine_topk",
    oracle="""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     p AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0)
SELECT c.vec_id AS vec_id, ROUND(list_cosine_similarity(c.e, p.e), 6) AS score
FROM c CROSS JOIN p
ORDER BY list_cosine_similarity(c.e, p.e) DESC, c.vec_id ASC
LIMIT 10
""",
)
def v_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 brute-force KNN top-10 for one probe (camp_vec_rcmn.py:44)."""
    emb = _t(spark, sf_dir, "embeddings")
    res = knn(emb, _probes(emb, 1), k=10)
    return res.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "v_threshold_group_max",
    oracle="""
WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
     p AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS e
           FROM embeddings WHERE vec_id < 3)
SELECT p.probe_id AS probe_id, c.label AS label,
       ROUND(MAX(list_cosine_similarity(c.e, p.e)), 6) AS max_score
FROM c CROSS JOIN p
WHERE list_cosine_similarity(c.e, p.e) >= 0.3
GROUP BY p.probe_id, c.label
""",
)
def v_threshold_group_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 range query + groupwise max (nl_targeting.py:55-56: V2+P3+A1)."""
    emb = _t(spark, sf_dir, "embeddings")
    res = threshold_search(emb, _probes(emb, 3), threshold=0.3, group_cols=["label"])
    return res.select(
        "probe_id", "label", F.round("max_score", 6).alias("max_score")
    )


@register(
    "v_multiprobe_fusion",
    oracle="""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     p AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS e
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT p.probe_id, c.vec_id, list_cosine_similarity(c.e, p.e) AS score
  FROM c CROSS JOIN p),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY score DESC, vec_id ASC) AS rn
  FROM scored),
fused AS (
  SELECT vec_id, COUNT(*) AS n_hits, SUM(score) AS fused_score
  FROM ranked WHERE rn <= 10 GROUP BY vec_id)
SELECT vec_id, n_hits, ROUND(fused_score, 6) AS fused_score,
       ROUND(fused_score / 5 * 100, 2) AS match_pct
FROM fused
ORDER BY fused.fused_score DESC, vec_id ASC
LIMIT 5
""",
)
def v_multiprobe_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5 multi-probe KNN + score fusion + top-5 (camp_vec_rcmn.py:30-73)."""
    emb = _t(spark, sf_dir, "embeddings")
    res = multiprobe_fusion(emb, _probes(emb, 5), k=10, top_n=5, n_probes_norm=5)
    return res.select(
        "vec_id",
        "n_hits",
        F.round("fused_score", 6).alias("fused_score"),
        "match_pct",
    )


@register(
    "v_knn_join_docs",
    oracle="""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     p AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
topk AS (
  SELECT c.vec_id, list_cosine_similarity(c.e, p.e) AS score
  FROM c CROSS JOIN p
  ORDER BY list_cosine_similarity(c.e, p.e) DESC, c.vec_id ASC
  LIMIT 10)
SELECT t.vec_id AS vec_id, ROUND(t.score, 6) AS score,
       d.lang AS lang, d.source AS source, d.n_chars AS n_chars
FROM topk t JOIN documents d ON d.doc_id = t.vec_id
""",
)
def v_knn_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 + J1: KNN hits enriched from the document corpus (flagship shape)."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    top = knn(emb, _probes(emb, 1), k=10)
    return (
        top.join(docs, top.vec_id == docs.doc_id, "inner")
        .select(
            "vec_id",
            F.round("score", 6).alias("score"),
            "lang",
            "source",
            "n_chars",
        )
    )


# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.2-2.8) — first slice
# ---------------------------------------------------------------------------


@register(
    "r_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def r_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped hash aggregation (A1-family; headline bench query)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "j_groupwise_max",
    oracle="""
SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS latest_date,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders) t
WHERE rn = 1 AND o_custkey < 100
""",
)
def j_groupwise_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/A2/W4 groupwise-max: latest row per group via window
    (nl_targeting_save.py:22-34's MAX(ML_SEQ) self-join, done idiomatically)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


@register(
    "a_group_concat_ordered",
    oracle="""
SELECT c_nationkey AS c_nationkey,
       STRING_AGG(c_name, ' !@#$ ' ORDER BY c_acctbal DESC, c_name DESC) AS members,
       COUNT(*) AS n_members
FROM customer
WHERE c_mktsegment = 'BUILDING'
GROUP BY c_nationkey
""",
)
def a_group_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 ordered GROUP_CONCAT with custom separator (camp_vec_rcmn.py:78-82)
    via the sort_array(collect_list(struct(...))) idiom."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    collected = cust.groupBy("c_nationkey").agg(
        F.sort_array(
            F.collect_list(F.struct("c_acctbal", "c_name")), asc=False
        ).alias("pairs"),
        F.count("*").alias("n_members"),
    )
    return collected.select(
        "c_nationkey",
        F.array_join(
            F.transform("pairs", lambda p: p.getField("c_name")), " !@#$ "
        ).alias("members"),
        "n_members",
    )


@register(
    "a_count_distinct_union",
    oracle="""
SELECT COUNT(DISTINCT cust) AS n_customers
FROM (
  SELECT o_custkey AS cust FROM orders WHERE o_orderstatus = 'O'
  UNION
  SELECT o_custkey AS cust FROM orders WHERE o_totalprice > 150000
) total
""",
)
def a_count_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+A9 audience count: COUNT(DISTINCT) over deduping UNION
    (camp_vec_rcmn.py:284-285)."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("cust")
    )
    b = orders.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("cust")
    )
    return (
        a.unionByName(b)
        .dropDuplicates()
        .agg(F.countDistinct("cust").alias("n_customers"))
    )
