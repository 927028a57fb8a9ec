"""Streaming CDC apply: a keyed change feed (upserts + deletes) merged
into a materialized table state, one micro-batch at a time.

The batch-side MERGE/SCD rows (``r_merge_upsert``, ``r_scd2_history``)
cover the one-shot form; this is the STREAMING form a lakehouse ingest
runs continuously: each micro-batch folds into the accumulated key state
(latest-change-wins by change time, delete tombstones retained so an old
upsert arriving later cannot resurrect a deleted key), and the final
table is the tombstone-filtered state. Reference analog: the per-row
``REPLACE INTO``/delete loop of nl_targeting_save.py:85-90, run as a
continuous feed instead of a batch script.

State versioning: each batch writes ``state_v{batch_id}`` and the next
batch reads the previous version — never an in-place overwrite of a
directory a lazy plan may still be reading. At 100 TB the same merge
runs partition-wise (hash-partition state by key, rewrite only touched
partitions); the per-batch cost here is O(state + batch), the shape a
Delta/Iceberg MERGE executes under the hood.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def make_cdc_batches(spark: SparkSession, events_path: str, out_dir: str) -> None:
    """Split the event log into three parquet files cut on day-of-month
    (1-10 / 11-20 / rest), mtimes ascending so the file source delivers
    them as three ordered micro-batches under ``maxFilesPerTrigger=1``.
    The cut is on event time, so cross-batch merge order equals global
    (ts, event_id) order — but the merge does NOT rely on that: it keys
    on (tus, event_id) max, so any batch arrival order converges to the
    same state."""
    import tempfile

    from ..sources.catalog import read_events

    ev = read_events(spark, events_path)
    os.makedirs(out_dir, exist_ok=True)
    stage = tempfile.mkdtemp(prefix="spark_graft_cdc_stage_")
    try:
        dom = F.dayofmonth("ts")
        for name, pred, mtime in (
            ("a", dom <= 10, 1_000_000_000),
            ("b", (dom > 10) & (dom <= 20), 1_000_000_100),
            ("c", dom > 20, 1_000_000_200),
        ):
            part_dir = os.path.join(stage, name)
            ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(part_dir)
            (part,) = _glob.glob(os.path.join(part_dir, "part-*.parquet"))
            dst = os.path.join(out_dir, f"{name}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (mtime, mtime))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _newest_state(work_dir: str, before: int | None = None) -> str | None:
    """Newest COMMITTED ``state_v{n}`` dir under work_dir (committed =
    has a ``_SUCCESS`` marker), optionally restricted to versions below
    ``before`` so a replayed batch reads its predecessor, never itself."""
    best, best_v = None, -1
    for p in _glob.glob(os.path.join(work_dir, "state_v*")):
        try:
            v = int(os.path.basename(p)[len("state_v"):])
        except ValueError:
            continue
        if before is not None and v >= before:
            continue
        if v > best_v and os.path.exists(os.path.join(p, "_SUCCESS")):
            best, best_v = p, v
    return best


def run_cdc_apply_availablenow(
    spark: SparkSession, in_dir: str, work_dir: str
) -> DataFrame:
    """Drain the change feed (one file per micro-batch) through a
    foreachBatch merge and return the final materialized table.

    Change semantics per event row: ``event_type='error'`` is a DELETE of
    the user key; anything else UPSERTs (user_id → value cents, change
    time = event time). Latest change by (tus, event_id) wins; tombstones
    stay in state so ordering across batches never matters.

    Restart-safe: the durable checkpointLocation means a RERUN over the
    same ``work_dir`` skips already-committed batches, so the first batch
    this process sees recovers its predecessor state from the newest
    committed ``state_v*`` on disk (version < batch_id — a replayed batch
    never reads its own partial output). The per-batch write is
    idempotent under foreachBatch replay: batch_id keys the output path
    and mode=overwrite rewrites the same content from the same
    predecessor. If every batch was already committed, no batch fires and
    the final read recovers the newest state directly."""
    from .windows import stream_events

    state = {"path": None}
    w = Window.partitionBy("user_id").orderBy(
        F.desc("tus"), F.desc("event_id")
    )

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        b = df.select(
            "user_id",
            F.unix_micros("ts").alias("tus"),
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("v100"),
            F.when(F.col("event_type") == "error", F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("is_del"),
        )
        prev = state["path"]
        if prev is None:
            prev = _newest_state(work_dir, before=batch_id)
        if prev is not None:
            b = spark.read.parquet(prev).unionByName(b)
        nxt = (
            b.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        out = os.path.join(work_dir, f"state_v{batch_id}")
        nxt.write.mode("overwrite").parquet(out)
        state["path"] = out

    src = stream_events(spark, in_dir, max_files_per_trigger=1)
    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = state["path"] or _newest_state(work_dir)
    if final is None:
        raise RuntimeError(f"no CDC state committed under {work_dir}")
    return (
        spark.read.parquet(final)
        .filter(F.col("is_del") == 0)
        .select(
            "user_id",
            F.col("v100").alias("last_v100"),
            F.col("event_id").alias("last_event_id"),
        )
    )
