"""End-to-end pipeline tests with deterministic fakes (SURVEY §5.2.4)."""

from pyspark.sql import functions as F

from vector_search_spark.llm.clients import FakeEmbeddingClient, FakeLLMClient
from vector_search_spark.pipelines.ingest import (
    build_campaign_vectors,
    build_condition_vectors,
)
from vector_search_spark.pipelines.nl_targeting import nl_targeting_conditions
from vector_search_spark.pipelines.recommend import recommend_similar_and_count
from vector_search_spark.plans.codegen import (
    Condition,
    audience_count_sql,
    clean_template,
    fill_template,
)


def test_fake_embedding_deterministic():
    c = FakeEmbeddingClient()
    a = c.embed_batch(["hello", "hello", "world"])
    assert a[0] == a[1] != a[2]
    assert len(a[0]) == 64
    assert abs(sum(x * x for x in a[0]) - 1.0) < 1e-9


def test_condition_vectors_shape(spark, sf_dir):
    df = build_condition_vectors(spark, sf_dir)
    rows = df.count()
    n_conds = df.select("cond_id").distinct().count()
    assert rows == n_conds * 3  # 3 paraphrases each
    dim = df.select(F.size("cond_vec").alias("d")).first().d
    assert dim == 64


def test_campaign_vectors_one_per_entity(spark, sf_dir):
    df = build_campaign_vectors(spark, sf_dir)
    assert df.count() == df.select("camp_id").distinct().count()


def test_nl_targeting_positive_and_negative(spark, sf_dir):
    cond_vec = build_condition_vectors(spark, sf_dir)
    out = nl_targeting_conditions(
        spark, sf_dir, "세그먼트=BUILDING 국가=NATION_5 not_국가=NATION_7",
        condition_vectors=cond_vec,
    ).collect()
    found = {(r.cond_nm, r.code_nm): r.max_score for r in out}
    assert found[("세그먼트", "BUILDING")] == 1.0  # exact sentence match
    assert found[("국가", "NATION_5")] == 1.0
    # negative subtraction removes a positive hit when attr+code collide
    out2 = nl_targeting_conditions(
        spark, sf_dir, "국가=NATION_5 not_국가=NATION_5",
        condition_vectors=cond_vec,
    ).collect()
    assert not any(r.code_nm == "NATION_5" for r in out2)


def test_recommend_end_to_end_deterministic(spark, sf_dir):
    camp = build_campaign_vectors(spark, sf_dir).cache()
    a = recommend_similar_and_count(spark, sf_dir, "프리미엄 고객", campaign_vectors=camp)
    b = recommend_similar_and_count(spark, sf_dir, "프리미엄 고객", campaign_vectors=camp)
    assert a["audience_sql"] == b["audience_sql"]
    assert "COUNT(DISTINCT cust_id)" in a["audience_sql"]
    assert a["recommendations"].count() == 5
    cnt = a["audience_count"].collect()[0].audience_cnt
    assert cnt == b["audience_count"].collect()[0].audience_cnt
    assert cnt >= 0


def test_codegen_template_cleanup():
    sql = clean_template("SELECT a /* strip\nme */  FROM  t @@MARK@@ WHERE x=1")
    assert sql == "SELECT a FROM t WHERE x=1"
    filled = fill_template(
        "SELECT k FROM t WHERE [c1] AND [c2]", {"c1": "a = 1", "c2": "b = 2"}
    )
    assert filled == "SELECT k FROM t WHERE a = 1 AND b = 2"
    # removed placeholder leaves no dangling AND
    assert (
        fill_template("SELECT k FROM t WHERE [gone] AND x = 1", {})
        == "SELECT k FROM t WHERE x = 1"
    )


def test_codegen_audience_sql_runs_on_both_engines(spark, sf_dir):
    import duckdb

    sql = audience_count_sql(
        [
            ("orders", "o_custkey", [Condition("o_totalprice", "gte", (150000,))]),
            ("customer", "c_custkey",
             [Condition("c_mktsegment", "in", ("BUILDING", "MACHINERY"))]),
        ]
    )
    for t in ("orders", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    got_spark = spark.sql(sql).collect()[0].audience_cnt
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    got_duck = con.execute(sql).fetchone()[0]
    assert got_spark == got_duck > 0
