"""Bucketed storage for co-located joins (SURVEY §4 scale levers).

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle. Writing
both sides bucketed by the join key (same bucket count) lets Spark plan a
SortMergeJoin with NO Exchange on either side — the bucketing IS the
partitioning. This module wraps the write/read pair; the test asserts the
join plan is exchange-free.

The reference has no storage layer at all (it delegates to MariaDB/MSSQL);
this is the Spark-native answer to "pre-partition the warehouse tables on
their join keys".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst elides
    both shuffles (verify: no Exchange above either scan in the plan)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
