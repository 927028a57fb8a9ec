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
from pyspark.sql.types import LongType, StructType


def _events_raw_schema(spark: SparkSession, path_glob: str) -> StructType:
    """File-source streams need an explicit schema. Derive it from a batch
    footer read under ``nanosAsLong`` so BOTH fixture generations work:
    TIMESTAMP(NANOS) surfaces ``ts`` as int64 nanos, TIMESTAMP(MICROS) as a
    timestamp (see sources.catalog.read_events)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path_glob).schema


def stream_events(
    spark: SparkSession, path_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over events parquet (use Trigger.availableNow in
    tests to drain it as a bounded stream)."""
    schema = _events_raw_schema(spark, path_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(path_dir)
    if isinstance(schema["ts"].dataType, LongType):
        raw = raw.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    # normalize TIMESTAMP_NTZ → TIMESTAMP (no-op otherwise; session tz is
    # UTC): withWatermark rejects NTZ event-time columns.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


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
    the static customer dim, then per-(segment, event_type) running
    totals accumulate in update-mode state. The static side is re-planned
    per micro-batch by Structured Streaming. UNHINTED on purpose (round-11
    broadcast audit): customer is SF-proportional, so the planner decides
    per batch — broadcast while the dim fits the threshold (every fixture
    scale), shuffle once it doesn't (100 TB customer can't ship to every
    task); a forced hint would OOM exactly when the data grows."""
    joined = events.join(
        dim, events.user_id == dim.c_custkey, "inner"
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


# ---------------------------------------------------------------------------
# Late-data / watermark certification (VERDICT r3 "What's missing" #3)
# ---------------------------------------------------------------------------

def make_late_data_batches(spark: SparkSession, events_glob: str, out_dir: str) -> None:
    """Split the event log into three parquet files that the file source
    picks up in watermark-meaningful order (mtime ascending, one file per
    micro-batch under ``maxFilesPerTrigger=1``):

    - ``a.parquet`` (batch 0): the three hours of events immediately
      before the log's final full hour ``fh``. Committing it advances the
      watermark to ``max(a.ts) - delay``.
    - ``b.parquet`` (batch 1): the final hour's events (``ts >= fh`` —
      ahead of every watermark, must be counted).
    - ``c.parquet`` (batch 2): the entire older backlog (``ts < fh-3h``) —
      LATE: its hour-windows closed ≥2h behind the watermark batch 0 set,
      so a correct engine drops every row.

    The backlog rides in the THIRD batch because Spark's stateful
    operators filter late events with the watermark of the *previous*
    trigger (watermarkForLateEvents, SPARK-40925): a batch-N row is
    checked against the watermark that was in force during batch N-1,
    i.e. the value committed at the end of batch N-2. Batch 2 is the
    first batch whose late-filter watermark reflects batch 0's event
    times — measured empirically on this engine (numRowsDroppedByWatermark
    stays 0 for late rows delivered in batch 1, fires in batch 2).

    The split is cut on the floor-hour of the global max timestamp, so
    every batch-2 row is unambiguously late (window end ≤ fh-3h vs
    late-filter watermark ≥ fh-2h at every fixture scale — the band
    [fh-3h, fh) always contains events within the last 40 minutes of its
    end). The files carry ``ts`` as a normalized timestamp column, so the
    stream reader's footer-derived schema applies to them unchanged.
    """
    import datetime as _dt
    import glob as _glob
    import os
    import shutil
    import tempfile

    from ..sources.catalog import read_events

    ev = read_events(spark, events_glob)
    fh: _dt.datetime = ev.agg(
        F.date_trunc("hour", F.max("ts")).alias("fh")
    ).first()["fh"]
    cutoff = fh - _dt.timedelta(hours=3)
    ts_type = ev.schema["ts"].dataType
    lo = F.lit(cutoff).cast(ts_type)
    hi = F.lit(fh).cast(ts_type)
    stage = tempfile.mkdtemp(prefix="spark_graft_late_stage_")
    try:
        for name, pred, mtime in (
            ("a", (F.col("ts") >= lo) & (F.col("ts") < hi), 1_000_000_000),
            ("b", F.col("ts") >= hi, 1_000_000_100),
            ("c", F.col("ts") < lo, 1_000_000_200),
        ):
            part_dir = os.path.join(stage, name)
            ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(part_dir)
            (part,) = _glob.glob(os.path.join(part_dir, "part-*.parquet"))
            dst = os.path.join(out_dir, f"{name}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (mtime, mtime))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def run_late_data_tumbling_availablenow(
    spark: SparkSession,
    path_dir: str,
    table_name: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drain the three-file late-data layout (``make_late_data_batches``
    writes files a/b/c) one file per micro-batch through a watermarked
    tumbling aggregation (update mode) and return the final per-window
    state. The three-batch ordering is load-bearing: Spark filters late
    rows against the PREVIOUS trigger's watermark (SPARK-40925), so file b
    is the spacer that lets file a's max event time become the operative
    watermark before file c's backlog of old events arrives — strictly
    behind it, and therefore dropped — the semantics this row certifies
    against a batch oracle that recomputes the keep-set arithmetically. Counts are monotone within a window, so max/max_by
    collapse per-batch update emissions to the final value."""
    ev = stream_events(spark, path_dir, max_files_per_trigger=1)
    q = (
        tumbling_agg(ev, "1 hour", watermark=watermark)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(table_name)
    return emitted.groupBy("window_start", "event_type").agg(
        F.max("n").alias("n"),
        F.max_by("sum_value", "n").alias("sum_value"),
    )


def run_stream_stream_join_availablenow(
    spark: SparkSession,
    path_glob: str,
    table_name: str,
    attribution: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """REAL stream-stream inner join (view→purchase attribution): two
    file-source streams over the same event log — one filtered to views,
    one to purchases — joined on user with the classic interval condition
    ``view.ts <= purchase.ts <= view.ts + attribution``. Both sides carry
    watermarks and the join carries the time-range constraint, which is
    exactly what lets Spark bound the join STATE at scale: a view's state
    row is dropped once the purchase-side watermark passes
    ``v_ts + attribution`` — without the range condition the state grows
    with the whole stream. Inner-join output emits matches immediately
    (append mode), so draining with availableNow yields the complete
    batch-equivalent match set."""
    views = (
        stream_events(spark, path_glob)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        stream_events(spark, path_glob)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            "value",
        )
        .withWatermark("p_ts", watermark)
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {attribution}")),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
