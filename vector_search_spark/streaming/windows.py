"""Structured Streaming extension (SURVEY §2.12, §7.6 — north star, the
reference itself is batch-only).

The same windowed aggregations run in BOTH modes: pass a batch DataFrame
(correctness surface, DuckDB-oracleable) or a streaming DataFrame from
``stream_events`` (incremental with watermarked state eviction). This is the
Spark-idiomatic re-expression of A6-style fusion as incremental aggregation:
``groupBy(window(...), keys).agg(...)`` is a streaming-safe stateful agg.

Late data: ``withWatermark(ts, delay)`` bounds state; events later than the
watermark are dropped — the policy the reference never had to state because
it re-reads whole tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# events.parquet physical schema: ts is TIMESTAMP(NANOS), which the file
# source only reads as long under nanosAsLong (see sources.catalog).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanos
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(spark: SparkSession, path_dir: str) -> DataFrame:
    """File-source stream over events parquet (use Trigger.availableNow in
    tests to drain it as a bounded stream)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(path_dir)
    return raw.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))


def tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Tumbling-window counts/sums per event_type (batch or stream)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window aggregation (each event lands in window/slide panes)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "5 minutes", watermark: str | None = None
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of silence."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_static_agg(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join + stateful aggregation: every micro-batch joins
    the static (broadcast) customer dim, then per-(segment, event_type)
    running totals accumulate in update-mode state. The static side is
    re-planned per micro-batch by Structured Streaming — at scale it stays
    a broadcast, so the stream never shuffles for the join itself."""
    joined = events.join(
        F.broadcast(dim), events.user_id == dim.c_custkey, "inner"
    )
    return joined.groupBy(
        F.col("c_mktsegment").alias("segment"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def run_stream_dedup_availablenow(
    spark, events_stream: DataFrame, table_name: str
) -> DataFrame:
    """Drain a bounded stream through ``dropDuplicates`` on the event key
    and return the deduplicated rows. Exactly-once ingestion dedup — the
    guard every at-least-once source (Kafka, file landing zones, replayed
    batches) needs in front of a training corpus. State holds one key per
    distinct event; a production continuous stream would use
    ``dropDuplicatesWithinWatermark`` to bound it — availableNow drains a
    finite backlog, so the unbounded-state variant is exact here."""
    q = (
        events_stream.dropDuplicates(["event_id"])
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


def run_stream_static_agg_availablenow(
    spark, events_stream: DataFrame, dim: DataFrame, table_name: str
) -> DataFrame:
    """Drain a bounded event stream through the stream-static join + agg
    (update mode) and return the final state per key (running totals are
    monotone in n, so max_by picks the last emission)."""
    q = (
        stream_static_agg(events_stream, dim)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(table_name)
    return emitted.groupBy("segment", "event_type").agg(
        F.max("n").alias("n"),
        F.max_by("sum_value", "n").alias("sum_value"),
    )
