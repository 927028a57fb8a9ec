"""Custom stateful streaming operators (SURVEY §2.12 extension surface).

The reference has no streaming at all; this is the north-star path for
A6-style score fusion as *incremental* state. ``applyInPandasWithState``
is the Spark-idiomatic tool for stateful logic the built-in windowed aggs
can't express (per-key running accumulators with custom emission/timeout
policy). State is per-group and partition-local — at 1000 executors each
key's state lives with its shuffle partition, so the operator scales with
the key cardinality, not the event volume.

``stateful_user_totals`` keeps (n_events, sum_value) per user across
micro-batches and emits the updated totals for every user seen in the
batch. Its final per-user emission equals the batch ``groupBy(user)``
aggregate — which is exactly how the correctness gate oracles it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("sum_value", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update_user_totals(key, pdfs, state: GroupState):
    """Fold a user's micro-batch rows into running (count, sum) state."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals across micro-batches (update mode).

    Each emission is the user's cumulative total so far; the last emission
    per user equals the global batch aggregate.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_totals_availablenow(
    spark, events_stream: DataFrame, table_name: str = "stateful_user_totals"
) -> DataFrame:
    """Drain a bounded stream through the stateful operator into a memory
    sink and return the LAST emission per user (cumulative totals are
    monotone in n_events, so max_by picks the final state)."""
    from pyspark.sql import functions as F

    q = (
        stateful_user_totals(events_stream)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(table_name)
    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
    )


def stream_dedup(events: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` arriving within the
    watermark horizon (state evicts beyond it — bounded memory at any
    volume, the streaming analog of the batch hash-groupBy dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


class _UserTotalsProcessor:
    """transformWithState processor: per-user running (count, sum). The
    Spark 4 successor API to applyInPandasWithState — state handles are
    typed and injected (getValueState), timers replace timeout confs, and
    the operator REQUIRES the RocksDB state store provider (which is also
    the provider a 100 TB deployment runs for state larger than heap)."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        if self._totals.exists():
            n, s = self._totals.get()
        else:
            n, s = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    def close(self) -> None:
        pass


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` — same
    semantics as ``stateful_user_totals``, new-generation API. Caller must
    have the RocksDB state store provider configured AND ``google.protobuf``
    installed (the TWS driver worker imports it; this container lacks it,
    so the paired test auto-skips — run it on any protobuf-equipped
    deployment)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class P(_UserTotalsProcessor, StatefulProcessor):
        pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=P(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
