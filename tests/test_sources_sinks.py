"""Source/sink coverage: write paths (S5/S6 re-expressed as df.write) and
bucketed co-located joins (the 100 TB shuffle-elision lever)."""

import pytest
from pyspark.sql import functions as F

from vector_search_spark.sources.bucketing import colocated_join, write_bucketed
from vector_search_spark.sources.catalog import load_table


def test_vector_sink_roundtrip(spark, sf_dir, tmp_path):
    """S5 batch sink: vectors written as parquet read back bit-identical
    (the reference's per-row INSERT with reconnect becomes one df.write)."""
    from vector_search_spark.pipelines.ingest import build_campaign_vectors

    out = str(tmp_path / "camp_vec")
    written = build_campaign_vectors(spark, sf_dir, out_path=out)
    direct = build_campaign_vectors(spark, sf_dir)
    a = {r.camp_id: r.embedding for r in written.collect()}
    b = {r.camp_id: r.embedding for r in direct.collect()}
    assert a == b and len(a) > 0


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Partitioned parquet: a filter on the partition column must prune
    scanned files (PartitionFilters in the scan, not a post-filter)."""
    out = str(tmp_path / "orders_by_status")
    load_table(spark, sf_dir, "orders").write.partitionBy("o_orderstatus").parquet(out)
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    want = (
        load_table(spark, sf_dir, "orders").filter("o_orderstatus = 'F'").count()
    )
    assert df.count() == want


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key → SortMergeJoin with zero
    Exchange nodes: the co-located join that kills the shuffle at scale."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketed_test LOCATION '{tmp_path / 'wh'}'"
    )
    spark.sql("USE bucketed_test")
    try:
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        write_bucketed(
            orders.withColumnRenamed("o_custkey", "custkey"),
            "b_orders", ["custkey"], 8, sort_cols=["custkey"],
        )
        write_bucketed(
            cust.withColumnRenamed("c_custkey", "custkey"),
            "b_customer", ["custkey"], 8, sort_cols=["custkey"],
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = colocated_join(spark, "b_orders", "b_customer", ["custkey"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            want = (
                orders.join(cust, orders.o_custkey == cust.c_custkey).count()
            )
            assert joined.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketed_test CASCADE")
        spark.sql("USE default")


def test_jdbc_scan_roundtrip_with_pushdown(spark, sf_dir):
    """S1/S2 evidence: a REAL JDBC read path (embedded Derby, in-JVM) —
    write nation over JDBC, read it back via load_jdbc with a partitioned
    range read, and verify a filter lands in the scan's PushedFilters."""
    from vector_search_spark.sources.catalog import load_jdbc, load_table

    url = "jdbc:derby:memory:graftdb;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    nation = load_table(spark, sf_dir, "nation")
    (
        nation.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_jdbc")
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )
    back = load_jdbc(
        spark, url, "nation_jdbc", driver=driver,
        partition_column="n_nationkey", num_partitions=4,
        lower_bound=0, upper_bound=25,
    )
    assert back.count() == nation.count()
    assert sorted(back.columns) == sorted(nation.columns)
    filtered = back.filter("n_regionkey = 1").select("n_name")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_regionkey" in plan.split("PushedFilters")[1][:200]
    want = {r.n_name for r in nation.filter("n_regionkey = 1").collect()}
    assert {r.n_name for r in filtered.collect()} == want


def test_csv_and_json_source_roundtrip(spark, sf_dir, tmp_path):
    """Format-agnostic source evidence beyond parquet: the same downstream
    code runs over CSV (header + inferred-safe explicit schema) and JSON
    lines sources with identical results."""
    from vector_search_spark.sources.catalog import load_table

    nation = load_table(spark, sf_dir, "nation")
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}

    csv_dir = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(csv_dir)
    back_csv = (
        spark.read.option("header", True)
        .schema(nation.schema)
        .csv(csv_dir)
    )
    assert {(r.n_nationkey, r.n_name, r.n_regionkey) for r in back_csv.collect()} == want

    json_dir = str(tmp_path / "nation_json")
    nation.write.mode("overwrite").json(json_dir)
    back_json = spark.read.schema(nation.schema).json(json_dir)
    assert {(r.n_nationkey, r.n_name, r.n_regionkey) for r in back_json.collect()} == want

    # filters still push into the non-parquet scans
    plan = (
        back_csv.filter("n_regionkey = 2")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan


def test_merge_schema_evolution_read(spark, tmp_path):
    """Schema evolution at the lake boundary: files written before a column
    existed must read back null-filled under mergeSchema, and the scan must
    still prune to the requested columns — the additive-evolution path an
    append-only corpus store lives on."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "evolve")
    spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("text")
    ).write.mode("overwrite").parquet(d)
    spark.range(5, 8).select(
        F.col("id").alias("doc_id"),
        F.lit("b").alias("text"),
        F.lit("en").alias("lang"),
    ).write.mode("append").parquet(d)
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"doc_id", "text", "lang"}
    assert df.count() == 8
    assert df.filter(F.col("lang").isNull()).count() == 5
    assert df.filter(F.col("lang") == "en").count() == 3


def test_json_csv_source_roundtrip(spark, sf_dir, tmp_path):
    """JSON-lines and CSV lake formats round-trip the documents table with
    explicit schemas (the only scale-safe way to read either — schema
    inference is a full extra pass at 100 TB). Text columns carry commas
    and quotes, so the CSV path exercises quoting/escaping too."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = docs.count()
    jd, cd = str(tmp_path / "json"), str(tmp_path / "csv")
    docs.write.mode("overwrite").json(jd)
    docs.write.mode("overwrite").option("header", True).option(
        "escape", '"'
    ).csv(cd)

    jback = spark.read.schema(docs.schema).json(jd)
    cback = (
        spark.read.schema(docs.schema)
        .option("header", True)
        .option("escape", '"')
        .csv(cd)
    )
    assert jback.count() == want and cback.count() == want
    # value fidelity: anti-join both directions is empty on the json path;
    # csv must at least preserve every (doc_id, n_chars, lang) triple and
    # the text length (csv is lossy only if quoting were wrong)
    assert jback.exceptAll(docs).count() == 0
    assert docs.exceptAll(jback).count() == 0
    c_keys = cback.select("doc_id", "lang", "n_chars", F.length("text").alias("L"))
    d_keys = docs.select("doc_id", "lang", "n_chars", F.length("text").alias("L"))
    assert c_keys.exceptAll(d_keys).count() == 0
    assert d_keys.exceptAll(c_keys).count() == 0


def test_pid_scratch_prunes_only_dead_pid_dirs(tmp_path):
    # pruning contract: dirs whose trailing _<pid> token names a DEAD pid
    # are removed; the caller's own dir, live pids, and non-numeric
    # suffixes are left alone
    import os

    import vector_search_spark.utils as U

    scratch = tmp_path / ".scratch"
    scratch.mkdir()
    # a GUARANTEED-dead pid: spawn and reap a real child — its pid is
    # freed on wait() (immediate reuse within this test is vanishingly
    # unlikely); a fixed large literal could collide with a live pid on
    # hosts with kernel.pid_max raised (systemd defaults to 4194304)
    import subprocess

    child = subprocess.Popen(["true"])
    child.wait()
    dead = child.pid
    (scratch / f"idx_sf0.01_{dead}").mkdir()
    (scratch / f"idx_sf0.01_{os.getpid()}").mkdir()
    (scratch / "idx_sf0.01_notapid").mkdir()
    (scratch / "otherindex_sf0.01_123").mkdir()  # different name prefix

    path = U.pid_scratch("idx", "/root/testdata/sf0.01", root=str(tmp_path))
    assert path.endswith(f"idx_sf0.01_{os.getpid()}")
    left = sorted(p.name for p in scratch.iterdir())
    assert f"idx_sf0.01_{dead}" not in left  # dead pruned
    assert f"idx_sf0.01_{os.getpid()}" in left  # own dir kept
    assert "idx_sf0.01_notapid" in left  # non-numeric kept
    assert "otherindex_sf0.01_123" in left  # other index untouched
