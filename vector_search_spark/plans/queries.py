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


# ---------------------------------------------------------------------------
# Relational batch 2 (SURVEY §2.2-2.8: J1-J8, A8, W1-W3, A10, F4/F7/F9)
# ---------------------------------------------------------------------------


@register(
    "r_denorm_campaign",
    oracle="""
WITH ord_agg AS (
  SELECT o_custkey,
         COUNT(*) AS n_orders,
         ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(o_orderstatus))), ',') AS statuses
  FROM orders GROUP BY o_custkey)
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
       COALESCE(n1.n_name, '없음') AS nation_r0,
       COALESCE(n2.n_name, '없음') AS nation_r1,
       COALESCE(a.n_orders, 0) AS n_orders,
       COALESCE(a.statuses, '') AS statuses
FROM customer c
LEFT JOIN nation n1 ON c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = 0
LEFT JOIN nation n2 ON c.c_nationkey = n2.n_nationkey AND n2.n_regionkey = 1
LEFT JOIN ord_agg a ON c.c_custkey = a.o_custkey
WHERE c.c_name LIKE 'Customer#00000000%'
""",
)
def r_denorm_campaign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The camp_vec_save.py:6-40 denormalization shape: prefix LIKE (P4),
    same dim joined twice with constant predicate (J2), derived-table
    aggregation join (J3+A3+A5), IFNULL (F1)."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_name").like("Customer#00000000%")
    )
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    n1 = nation.filter(F.col("n_regionkey") == 0).select(
        F.col("n_nationkey").alias("k1"), F.col("n_name").alias("nation_r0")
    )
    n2 = nation.filter(F.col("n_regionkey") == 1).select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("nation_r1")
    )
    agg = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.array_join(
            F.sort_array(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
    )
    return (
        cust.join(F.broadcast(n1), cust.c_nationkey == n1.k1, "left")
        .join(F.broadcast(n2), cust.c_nationkey == n2.k2, "left")
        .join(agg, cust.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("nation_r0", F.lit("없음")).alias("nation_r0"),
            F.coalesce("nation_r1", F.lit("없음")).alias("nation_r1"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("statuses", F.lit("")).alias("statuses"),
        )
    )


@register(
    "a_dynamic_threshold",
    oracle="""
SELECT o_orderstatus AS o_orderstatus,
       COUNT(*) AS n_above,
       ROUND(AVG(o_totalprice), 2) AS avg_above
FROM orders
WHERE o_totalprice > (
  SELECT AVG(o_totalprice) + 0.5 * STDDEV_SAMP(o_totalprice) FROM orders)
GROUP BY o_orderstatus
""",
)
def a_dynamic_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+P7 dynamic threshold = mean + 0.5·stddev_samp (camp_vec_rcmn.py:97,
    pandas ddof=1 == stddev_samp), applied via broadcast scalar join."""
    orders = _t(spark, sf_dir, "orders")
    stats = orders.agg(
        (F.avg("o_totalprice") + 0.5 * F.stddev_samp("o_totalprice")).alias("thr")
    )
    return (
        orders.crossJoin(F.broadcast(stats))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_above"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_above"),
        )
    )


@register(
    "w_running_sum",
    oracle="""
SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders WHERE o_custkey < 300
""",
)
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 running sum over ordered events (camp_vec_rcmn.py:148-158's
    ``current_weight +=`` loop as a window frame)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "w_lead_gap",
    oracle="""
SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
       CAST(DATE_DIFF('day', o_orderdate,
         LEAD(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS BIGINT)
       AS gap_days
FROM orders WHERE o_custkey < 300
QUALIFY gap_days IS NOT NULL
""",
)
def w_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 next-point lookahead (camp_vec_rcmn.py:153-158) via lead()."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.lead("o_orderdate").over(w).cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            .cast("long")
            .alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )


@register(
    "t_sweepline_dates",
    oracle="""
WITH iv AS (
  SELECT o_orderpriority AS name,
         DATE_DIFF('day', DATE '1970-01-01', o_orderdate::DATE) AS s,
         DATE_DIFF('day', DATE '1970-01-01', o_orderdate::DATE) + 30 AS e
  FROM orders WHERE o_custkey < 100),
ev AS (
  SELECT name, s AS point, 1.0 AS delta FROM iv
  UNION ALL
  SELECT name, e + 1 AS point, -1.0 AS delta FROM iv),
d AS (SELECT name, point, SUM(delta) AS delta FROM ev GROUP BY name, point),
seg AS (
  SELECT name, point AS sp,
         LEAD(point) OVER (PARTITION BY name ORDER BY point) - 1 AS se,
         SUM(delta) OVER (PARTITION BY name ORDER BY point
                          ROWS UNBOUNDED PRECEDING) AS weight
  FROM d)
SELECT name,
       STRFTIME(DATE '1970-01-01' + sp::INT, '%Y-%m-%d') AS seg_start,
       STRFTIME(DATE '1970-01-01' + se::INT, '%Y-%m-%d') AS seg_end,
       CAST(weight AS BIGINT) AS weight
FROM seg WHERE se IS NOT NULL AND weight > 0
""",
)
def t_sweepline_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 sweep-line over date intervals (camp_vec_rcmn.py:162-186):
    [o_orderdate, +30d] per priority → overlap depth per elementary
    interval. Inclusive-end semantics incl. the touching-intervals rule
    (T3) and the date +1 gap handling (camp_vec_rcmn.py:177-178)."""
    from ..operators.sweepline import sweep_overlap_dates

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    iv = orders.select(
        F.col("o_orderpriority").alias("name"),
        F.col("o_orderdate").cast("date").alias("start_date"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("end_date"),
    )
    out = sweep_overlap_dates(iv)
    return out.select(
        "name",
        F.date_format("seg_start", "yyyy-MM-dd").alias("seg_start"),
        F.date_format("seg_end", "yyyy-MM-dd").alias("seg_end"),
        F.col("weight").cast("long").alias("weight"),
    )


@register(
    "f_json_extract",
    oracle="""
SELECT event_type AS event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events
GROUP BY event_type
""",
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8 JSON field extraction (nl_targeting_save.py:46-61) over the
    events.props JSON blob column."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@register(
    "f_date_epoch_roundtrip",
    oracle="""
SELECT o_orderkey AS o_orderkey,
       STRFTIME(o_orderdate, '%Y%m%d') AS ymd,
       CAST(DATE_DIFF('day', DATE '1970-01-01', o_orderdate::DATE) AS BIGINT) AS epoch_day,
       STRFTIME(DATE '1970-01-01'
                + DATE_DIFF('day', DATE '1970-01-01', o_orderdate::DATE)::INT,
                '%Y-%m-%d') AS roundtrip
FROM orders WHERE o_orderkey < 1000
""",
)
def f_date_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 date↔epoch-day conversions (sru.Epoch_date / date_from_epoch,
    camp_vec_rcmn.py:131-132,204-209), standardized on day-granularity."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    epoch = F.lit("1970-01-01").cast("date")
    eday = F.datediff(F.col("o_orderdate").cast("date"), epoch)
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").alias("ymd"),
        eday.cast("long").alias("epoch_day"),
        F.date_format(F.date_add(epoch, eday), "yyyy-MM-dd").alias("roundtrip"),
    )


@register(
    "j_semi_topk",
    oracle="""
SELECT o.o_orderkey AS o_orderkey, o.o_custkey AS o_custkey,
       o.o_orderstatus AS o_orderstatus
FROM orders o
WHERE o.o_custkey IN (
  SELECT c_custkey FROM (
    SELECT c_custkey FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 5))
""",
)
def j_semi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 semi-join against a top-k id set (camp_vec_rcmn.py:74-82's
    IN-list of top-5 ids, done as left_semi instead of string splicing)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    top5 = cust.orderBy(F.desc("c_acctbal"), F.asc("c_custkey")).limit(5)
    return orders.join(
        F.broadcast(top5), orders.o_custkey == top5.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_orderstatus")


@register(
    "j_anti_negative",
    oracle="""
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderstatus = 'F' AND o.o_totalprice > 100000)
""",
)
def j_anti_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/U3 negative-set subtraction (nl_targeting.py:112-123) as a
    left_anti join: customers minus the 'negative' audience."""
    cust = _t(spark, sf_dir, "customer")
    neg = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000)
    )
    return cust.join(
        neg, cust.c_custkey == neg.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "p_filters_composite",
    oracle="""
SELECT l_orderkey AS l_orderkey, l_linenumber AS l_linenumber,
       l_returnflag AS l_returnflag, ROUND(l_quantity, 2) AS l_quantity
FROM lineitem
WHERE l_returnflag IN ('A', 'R')
  AND l_quantity >= 49
  AND l_shipdate IS NOT NULL
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-01-01'
""",
)
def p_filters_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3-P6 composite predicates: IN-list, threshold, IS NOT NULL, range —
    all pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_quantity") >= 49)
        & F.col("l_shipdate").isNotNull()
        & F.col("l_shipdate").between("1996-01-01", "1997-01-01")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round("l_quantity", 2).alias("l_quantity"),
    )


@register(
    "f_sentence_serialize",
    oracle="""
SELECT c_custkey AS c_custkey,
       'c_name은 ' || c_name || ' 입니다. c_mktsegment은 ' || c_mktsegment
       || ' 입니다. c_nationkey은 ' || CAST(c_nationkey AS VARCHAR)
       || ' 입니다.' AS sentence
FROM customer WHERE c_custkey < 50
""",
)
def f_sentence_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 row→sentence serialization for embedding input
    (camp_vec_save.py:49-56: '{col}은 {val} 입니다.' joined by spaces)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    return cust.select(
        "c_custkey",
        F.concat(
            F.lit("c_name은 "), F.col("c_name"),
            F.lit(" 입니다. c_mktsegment은 "), F.col("c_mktsegment"),
            F.lit(" 입니다. c_nationkey은 "),
            F.col("c_nationkey").cast("string"),
            F.lit(" 입니다."),
        ).alias("sentence"),
    )


# ---------------------------------------------------------------------------
# North-star: dedup + text-analysis family over `documents` (SURVEY §7.5 +
# driver north_star: "dedup, similarity search, text analysis")
# ---------------------------------------------------------------------------


def _duck_poly(expr: str, v: str = "x") -> str:
    """DuckDB SQL for the portable polynomial hash of a string expression.

    Mirrors functions.text.poly_hash bit-for-bit. ``v`` prefixes lambda
    variable names so nested uses don't shadow each other.
    """
    return (
        f"((list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, length({expr})), "
        f"{v}i -> CAST(ascii(substr({expr}, {v}i, 1)) AS BIGINT))), "
        f"({v}a, {v}c) -> ({v}a * 31 + {v}c) % 1000000007) + 13) "
        f"* 2654435761) % 1000000007"
    )


_DUCK_TOKENS = "list_distinct(string_split(text, ' '))"
_DUCK_MINHASH_SIG = (
    "list_transform(generate_series(0, 15), s -> "
    "list_min(list_transform(tk, t -> "
    + _duck_poly("(t || '#' || s)", v="p")
    + ")))"
)


@register(
    "d_exact_dedup_stats",
    oracle="""
SELECT source AS source,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT text) AS n_distinct,
       COUNT(*) - COUNT(DISTINCT text) AS n_dups
FROM documents GROUP BY source
""",
)
def d_exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy: per-source duplicate statistics."""
    from ..operators.dedup import exact_dup_stats

    return exact_dup_stats(_t(spark, sf_dir, "documents"), "text", ["source"])


@register(
    "d_tokenset_dedup",
    oracle=f"""
WITH fp AS (
  SELECT doc_id, lang,
         {_duck_poly("array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')")} AS fingerprint
  FROM documents)
SELECT lang AS lang, COUNT(*) AS n_docs,
       COUNT(DISTINCT fingerprint) AS n_distinct_sets
FROM fp GROUP BY lang
""",
)
def d_tokenset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical token-set dedup: docs with the same distinct-token set share
    a fingerprint regardless of word order/repetition."""
    from ..operators.dedup import tokenset_fingerprint

    docs = _t(spark, sf_dir, "documents")
    fp = tokenset_fingerprint(docs, "text", "doc_id").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return fp.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_distinct_sets"),
    )


@register(
    "d_jaccard_pairs",
    oracle="""
WITH t AS (
  SELECT doc_id, source, lang, list_distinct(string_split(text, ' ')) AS tk
  FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.tk, b.tk))::DOUBLE
             / len(list_distinct(list_concat(a.tk, b.tk))), 6) AS jaccard
FROM t a JOIN t b
  ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.tk, b.tk))::DOUBLE
      / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.5
""",
)
def d_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/token Jaccard near-dup pairs within (source, lang) blocks."""
    from ..operators.dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    res = jaccard_pairs(docs, "text", "doc_id", ["source", "lang"], 0.5)
    return res.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "d_minhash_lsh_pairs",
    oracle=f"""
WITH t AS (
  SELECT doc_id AS id, {_DUCK_TOKENS} AS tk FROM documents),
sigs AS (
  SELECT id, tk, {_DUCK_MINHASH_SIG} AS sig FROM t),
banded AS (
  SELECT id, tk, b.band,
         array_to_string(list_transform(sig[b.band*4+1 : b.band*4+4],
                                        x -> CAST(x AS VARCHAR)), ',') AS key
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS band) b),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.id < b.id),
rerank AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(ta.tk, tb.tk))::DOUBLE
         / len(list_distinct(list_concat(ta.tk, tb.tk))) AS jaccard
  FROM cands c JOIN t ta ON ta.id = c.id_a JOIN t tb ON tb.id = c.id_b)
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
FROM rerank WHERE jaccard >= 0.5
""",
)
def d_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline: shingle → 16-hash signature → 4 bands
    → bucket-join candidates → exact-Jaccard re-rank. Candidate generation
    is oracle-checked exactly (portable hash)."""
    from ..operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    res = minhash_lsh_pairs(docs, "text", "doc_id", 16, 4, 0.5)
    return res.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "d_simhash_groups",
    oracle=f"""
WITH t AS (
  SELECT doc_id AS id, {_DUCK_TOKENS} AS tk FROM documents),
sh AS (
  SELECT id,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(generate_series(0, 29), j ->
        CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(tk, t ->
                 CASE WHEN ({_duck_poly("t", v="q")} >> j) & 1 = 1
                      THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
               (va, vb) -> va + vb) > 0
             THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)),
      (ba, bb) -> ba + bb) AS simhash
  FROM t)
SELECT sh.id AS id, sh.simhash AS simhash, g.group_size AS group_size
FROM sh JOIN (SELECT simhash, COUNT(*) AS group_size FROM sh GROUP BY simhash) g
  USING (simhash)
""",
)
def d_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (30-bit, portable hash) fingerprints + collision-group size."""
    from ..operators.dedup import simhash_groups

    return simhash_groups(_t(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "d_embedding_neardup",
    oracle="""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS block,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.3
""",
)
def d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within cluster blocks."""
    from ..operators.dedup import embedding_neardup_pairs

    res = embedding_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.3)
    return res.select("id_a", "id_b", "block", F.round("cos", 6).alias("cos"))


# ---------------------------------------------------------------------------
# North-star: text analysis (language-ID, quality, token counts, fingerprint)
# ---------------------------------------------------------------------------


@register(
    "t_lang_id",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
scores AS (
  SELECT doc_id,
         len(list_filter(tk, t -> t IN ('the', 'a'))) AS s_article,
         len(list_filter(tk, t -> t IN ('spark', 'query', 'table', 'join'))) AS s_engine,
         len(list_filter(tk, t -> t IN ('vector', 'row', 'column', 'value'))) AS s_data
  FROM t)
SELECT doc_id AS doc_id,
       CASE WHEN s_article > s_engine AND s_article > s_data THEN 'article'
            WHEN s_engine > s_article AND s_engine > s_data THEN 'engine'
            WHEN s_data > s_article AND s_data > s_engine THEN 'data'
            ELSE 'tie' END AS pred_class,
       CAST(s_article AS BIGINT) AS s_article,
       CAST(s_engine AS BIGINT) AS s_engine,
       CAST(s_data AS BIGINT) AS s_data
FROM scores
""",
)
def t_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic marker-token classifier (the language-ID shape: n-gram /
    marker profiles → argmax with deterministic tie rule)."""
    from ..functions.text import LANG_MARKERS, tokens

    docs = _t(spark, sf_dir, "documents")
    tk = tokens("text")
    d = docs.select(
        "doc_id",
        F.size(F.filter(tk, lambda t: t.isin(*LANG_MARKERS["article"]))).alias("s_article"),
        F.size(F.filter(tk, lambda t: t.isin(*LANG_MARKERS["engine"]))).alias("s_engine"),
        F.size(F.filter(tk, lambda t: t.isin(*LANG_MARKERS["data"]))).alias("s_data"),
    )
    pred = (
        F.when(
            (F.col("s_article") > F.col("s_engine"))
            & (F.col("s_article") > F.col("s_data")),
            "article",
        )
        .when(
            (F.col("s_engine") > F.col("s_article"))
            & (F.col("s_engine") > F.col("s_data")),
            "engine",
        )
        .when(
            (F.col("s_data") > F.col("s_article"))
            & (F.col("s_data") > F.col("s_engine")),
            "data",
        )
        .otherwise("tie")
    )
    return d.select(
        "doc_id",
        pred.alias("pred_class"),
        F.col("s_article").cast("long").alias("s_article"),
        F.col("s_engine").cast("long").alias("s_engine"),
        F.col("s_data").cast("long").alias("s_data"),
    )


@register(
    "t_quality_score",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         list_distinct(string_split(text, ' ')) AS dtk
  FROM documents),
m AS (
  SELECT doc_id,
         len(tk) AS n_tok,
         len(dtk)::DOUBLE / len(tk) AS distinct_ratio,
         len(list_filter(tk, t -> t IN ('the','a','and','of','to','in','is')))::DOUBLE
           / len(tk) AS stop_ratio,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(tk, t -> CAST(length(t) AS BIGINT))),
           (a, b) -> a + b)::DOUBLE / len(tk) AS mean_len
  FROM t)
SELECT doc_id AS doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       ROUND(distinct_ratio, 6) AS distinct_ratio,
       ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(mean_len, 6) AS mean_len,
       ROUND(0.4 * distinct_ratio + 0.3 * (1 - stop_ratio)
             + 0.3 * LEAST(mean_len / 10, 1.0), 6) AS quality
FROM m
""",
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: distinct-token ratio, stopword ratio,
    mean token length → weighted composite score."""
    from ..functions.text import STOPWORDS, tokens

    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        tokens("text").alias("tk"),
        F.array_distinct(tokens("text")).alias("dtk"),
    )
    n_tok = F.size("tk")
    distinct_ratio = F.size("dtk").cast("double") / n_tok
    stop_ratio = (
        F.size(F.filter("tk", lambda t: t.isin(*STOPWORDS))).cast("double") / n_tok
    )
    mean_len = (
        F.aggregate(
            F.transform("tk", lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).cast("double")
        / n_tok
    )
    quality = (
        0.4 * distinct_ratio
        + 0.3 * (1 - stop_ratio)
        + 0.3 * F.least(mean_len / 10, F.lit(1.0))
    )
    return d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tok"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_len, 6).alias("mean_len"),
        F.round(quality, 6).alias("quality"),
    )


@register(
    "t_token_count",
    oracle="""
SELECT doc_id AS doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS alpha_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
)
def t_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + regex (BPE-ish) token count."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+")).cast("long").alias("alpha_tokens"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("distinct_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "t_fingerprint",
    oracle=f"""
SELECT doc_id AS doc_id, {_duck_poly("text")} AS fingerprint
FROM documents
""",
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (portable polynomial hash)."""
    from ..functions.text import rolling_fingerprint

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_fingerprint("text").alias("fingerprint"))


@register("a_approx_count_distinct", oracle=None)
def a_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 at 100 TB: approx_count_distinct (HLL) variant of the audience
    count — estimator-specific, so rows-only (no DuckDB value oracle)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


# ---------------------------------------------------------------------------
# Pipeline surface (SURVEY §3.1-3.3): ingest + query dataflows with
# deterministic LLM/embedding fakes. Relational stages get oracles; stages
# depending on embedding values are rows-only by design (SURVEY §5.2.4).
# ---------------------------------------------------------------------------


@register(
    "pipe_condition_catalog",
    oracle="""
WITH cat AS (
  SELECT '세그먼트' AS cond_nm, code, code AS code_nm, 'string' AS cond_type,
         'c_mktsegment' AS column_nm, 'customer' AS table_nm
  FROM (SELECT DISTINCT c_mktsegment AS code FROM customer)
  UNION ALL
  SELECT '국가', CAST(n_nationkey AS VARCHAR), n_name, 'string',
         'c_nationkey', 'customer'
  FROM nation
  UNION ALL
  SELECT '주문금액', '', '주문 총액', 'integer', 'o_totalprice', 'orders'
  UNION ALL
  SELECT '주문일자', '', '주문 일자', 'datePopup', 'o_orderdate', 'orders')
SELECT cond_nm || '#' || code AS cond_id,
       cond_nm AS cond_nm, code AS code, code_nm AS code_nm,
       cond_type AS cond_type, column_nm AS column_nm, table_nm AS table_nm,
       cond_nm || ' ' || code_nm || ' 검색 문장 ' || CAST(i AS VARCHAR) AS sentence
FROM cat, (SELECT unnest(generate_series(0, 2)) AS i)
""",
)
def pipe_condition_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nl_targeting_save.py catalog + L5 paraphrase fan-out, pre-embedding —
    the relational spine of the condition-vector ingest (S3 dynamic lookups
    pre-joined, 3 paraphrases per condition)."""
    from ..pipelines.ingest import build_condition_vectors

    df = build_condition_vectors(spark, sf_dir)
    return df.select(
        "cond_id", "cond_nm", "code", "code_nm", "cond_type",
        "column_nm", "table_nm", "sentence",
    )


@register(
    "pipe_campaign_sentences",
    oracle="""
WITH agg AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(o_orderstatus))), ',') AS statuses
  FROM orders GROUP BY o_custkey)
SELECT c.c_custkey AS camp_id,
       '이름은 ' || c.c_name || ' 입니다. 국가는 ' || COALESCE(n.n_name, '없음')
       || ' 입니다. 세그먼트는 ' || c.c_mktsegment || ' 입니다. 주문수는 '
       || CAST(COALESCE(a.n_orders, 0) AS VARCHAR) || ' 입니다. 상태는 '
       || COALESCE(a.statuses, '없음') || ' 입니다.' AS sentence
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN agg a ON c.c_custkey = a.o_custkey
""",
)
def pipe_campaign_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """camp_vec_save.py denormalization + F4 sentence serialization,
    pre-embedding (the write-pipeline's relational spine)."""
    from ..pipelines.ingest import _campaign_denorm

    return _campaign_denorm(spark, sf_dir)


@register("pipe_campaign_vectors", oracle=None)
def pipe_campaign_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full camp_vec_save equivalent incl. mapInPandas batch embedding —
    rows-only (embedding values live outside SQL)."""
    from ..pipelines.ingest import build_campaign_vectors

    df = build_campaign_vectors(spark, sf_dir)
    return df.select(
        "camp_id", F.size("embedding").alias("dim"),
        F.round(F.sqrt(F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, b: a + b)), 4).alias("l2norm"),
    )


@register("pipe_nl_targeting", oracle=None)
def pipe_nl_targeting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end nl_targeting.py equivalent with deterministic fakes:
    keyword extraction → vector threshold search → code resolution →
    negative subtraction. Rows-only (depends on fake-embedding cosines)."""
    from ..pipelines.nl_targeting import nl_targeting_conditions

    return nl_targeting_conditions(
        spark, sf_dir, "세그먼트=BUILDING 국가=NATION_5 not_국가=NATION_7"
    )


@register("pipe_recommend_audience", oracle=None)
def pipe_recommend_audience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end camp_vec_rcmn.py equivalent: expansion → fusion → condition
    mining (sweep-line) → SQL codegen → COUNT(DISTINCT) audience. Rows-only
    (fused scores come from fake embeddings)."""
    from ..pipelines.recommend import recommend_similar_and_count

    out = recommend_similar_and_count(spark, sf_dir, "프리미엄 고객 대상 할인 캠페인")
    return out["audience_count"]
