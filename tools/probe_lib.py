"""Shared probe plumbing for the tools/ scale and skew sweeps: timing,
Spark-REST stage introspection, and the UI-enabled / AQE-skew-tuned
session the skew probes need. Extracted from tools/scale_probe.py
(round 8) so skew_sweep.py and the per-family probe modules share one
copy. Fixture replication stays in scale_probe.py / make_scaled_fixtures
(their salting semantics differ on purpose)."""

from __future__ import annotations

import json
import time

UI_PORT = 4050


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def _rest(ui_port: int, path: str):
    import urllib.request

    with urllib.request.urlopen(f"http://localhost:{ui_port}/api/v1{path}") as r:
        return json.load(r)


def heaviest_stage_task_quantiles(ui_port: int, min_stage_id: int):
    """(stage_id, [min, p50, max] task duration in s) for the completed
    stage with the most executor run time at/after ``min_stage_id`` —
    pulled from the Spark REST API (UI must be enabled)."""
    app = _rest(ui_port, "/applications")[0]["id"]
    stages = [
        s
        for s in _rest(ui_port, f"/applications/{app}/stages?status=complete")
        if s["stageId"] >= min_stage_id
    ]
    if not stages:
        # REST listing lags stage completion by a beat; a fully-cached
        # run can also complete zero new stages in the window
        return -1, [0.0, 0.0, 0.0]
    best = max(stages, key=lambda s: s.get("executorRunTime", 0))
    q = _rest(
        ui_port,
        f"/applications/{app}/stages/{best['stageId']}/{best['attemptId']}"
        "/taskSummary?quantiles=0.0,0.5,1.0",
    )
    return best["stageId"], [round(x / 1000.0, 2) for x in q["duration"]]


def shuffle_write_bytes_since(ui_port: int, min_stage_id: int) -> int:
    """Total shuffle-write bytes across completed stages at/after
    ``min_stage_id`` (REST API; UI must be enabled)."""
    app = _rest(ui_port, "/applications")[0]["id"]
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in _rest(ui_port, f"/applications/{app}/stages?status=complete")
        if s["stageId"] >= min_stage_id
    )


def completed_stage_count(ui_port: int) -> int:
    app = _rest(ui_port, "/applications")[0]["id"]
    stages = _rest(ui_port, f"/applications/{app}/stages")
    return 1 + max((s["stageId"] for s in stages), default=-1)


def ui_skew_session(app_name: str, ui_port: int = UI_PORT):
    """UI-enabled session with AQE skew-join thresholds lowered so a
    ~60 MB hot partition counts as skewed (prod default 256 MB — same
    mechanism, probe-sized data). Must be built BEFORE any other session
    in the process (Spark reuses the first JVM's config)."""
    from pyspark.sql import SparkSession

    from vector_search_spark.session import cpu_count

    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpu_count()}]")
        .config("spark.sql.shuffle.partitions", str(cpu_count()))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .getOrCreate()
    )
