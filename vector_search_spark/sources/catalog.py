"""Table catalog over the driver fixtures.

The reference reads MariaDB/MSSQL tables through embedded SQL
(camp_vec_save.py:42-45, nl_targeting_save.py:37-40, camp_vec_rcmn.py:40-47);
here every table is a Spark source read lazily so Catalyst can push filters
and prune columns into the scan. Parquet fixtures are the test backing; the
same call sites work for any ``spark.read.format(...)`` source (JDBC included)
because nothing downstream assumes a format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Events read that adapts to the fixture's physical timestamp type.
    Fixture generations have shipped ``ts`` as both TIMESTAMP(NANOS) —
    which the vectorized parquet reader only accepts as int64 under
    ``nanosAsLong`` — and plain TIMESTAMP(MICROS). Setting the legacy conf
    is harmless for micros files, so set it, read, and convert only when
    the column actually surfaced as a long (µs precision is enough — all
    downstream bucketing is ≥1s grain)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    # micros files surface as TIMESTAMP_NTZ; normalize to TIMESTAMP (session
    # tz is pinned UTC, so the instant is unchanged) — watermarks and every
    # downstream consumer expect the event-time column to be TIMESTAMP.
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, f"{sf_dir}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan — the literal S1/S2 path (MariaDB ``pymysql`` /
    MSSQL ``pymssql`` reads in camp_vec_rcmn.py:40-47 and
    nl_targeting_save.py:37-40, re-expressed as a Spark source).

    Catalyst pushes filters and column pruning into the generated SQL
    (``PushedFilters`` in the scan node), and ``partition_column`` +
    bounds split the read into ``num_partitions`` parallel range queries —
    at cluster scale a single-connection read is the bottleneck, so always
    pass a numeric/key column here for big tables.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
