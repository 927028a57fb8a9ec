"""Execution-shape helpers shared across operator families."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ensure a DataFrame entering an Arrow/Python (``mapInPandas``) stage
    has at least ``defaultParallelism`` partitions.

    A small scan — one parquet file at test scale — arrives as a single
    partition, which serializes the whole Python stage through one worker
    (measured 4× on the sf0.1 shingle stage). At cluster scale inputs
    already exceed the core count and this is a no-op; the partition count
    comes from plan metadata, no job runs. The round-robin shuffle moves
    only the rows feeding the Python stage, and every consumer downstream
    of our Arrow stages is order-insensitive (sets, joins, aggregates), so
    the reshuffle is semantics-free.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
