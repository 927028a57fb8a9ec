"""True Structured Streaming tests: the batch-mode queries rerun as a
bounded stream (availableNow) must produce identical results."""

import shutil
import tempfile

import pytest

from vector_search_spark.sources.catalog import load_table
from vector_search_spark.streaming.windows import (
    session_agg,
    stream_events,
    tumbling_agg,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _drain(stream_df, spark, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_equals_batch(spark, sf_dir, events_dir):
    batch = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in tumbling_agg(load_table(spark, sf_dir, "events"), "1 hour").collect()
    }
    stream = stream_events(spark, events_dir)
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in _drain(
            tumbling_agg(stream, "1 hour", watermark="10 minutes"), spark, "t_tumble"
        ).collect()
    }
    assert got == batch


def test_session_stream_equals_batch(spark, sf_dir, events_dir):
    batch = {
        (r.session_start, r.user_id): r.n_events
        for r in session_agg(load_table(spark, sf_dir, "events"), "5 minutes").collect()
    }
    stream = stream_events(spark, events_dir)
    got = {
        (r.session_start, r.user_id): r.n_events
        for r in _drain(
            session_agg(stream, "5 minutes", watermark="10 minutes"),
            spark,
            "t_session",
        ).collect()
    }
    assert got == batch
