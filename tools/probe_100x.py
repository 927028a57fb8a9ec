"""100x scale probe (VERDICT r8 next #1): run the flagship index / dedup /
packing / temporal rows END-TO-END at the 100x replicated+zipf fixture
(~sf10: 60M lineitem, 10M events, 500k docs, 200k vectors) and report the
wall ratio vs the 10x fixture plus the heaviest stage's task balance.

The driver's grading axis is "plans you'd want at 100x scale" — this tool
turns the design argument into a measurement. Target: wall ratio ≲ 10x
per decade (~linear), heaviest-stage max/p50 ≲ 3 (no hot-key
serialization), no OOM.

The graph trio runs at the OPERATOR level with the AUTO band knob
(auto_band_bits holds expected bucket size constant at any corpus size —
the registry rows pin band_bits=6 for DuckDB replay, which at 200k
vectors would mean ~3k-row buckets and quadratic candidate volume; a
deployment uses the auto knob, so that is what the scale probe measures).
Value checks at 100x run separately through tools/parity.py on the rows
whose DuckDB oracle fits memory (see SCALING.md round 9).

Usage: python tools/probe_100x.py [dir10x] [dir100x] [row ...]
Defaults: /root/repo/.scratch/sfx10_zipf /root/repo/.scratch/sfx100_zipf,
all flagship rows. One JSON line per row.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from probe_lib import (  # noqa: E402
    UI_PORT,
    completed_stage_count,
    heaviest_stage_task_quantiles,
    ui_skew_session,
)

REGISTRY_ROWS = [
    "d_minhash_lsh_pairs",
    "d_dup_clusters",
    "pipe_dedup_twolevel",
    "t_sequence_packing",
    "j_asof_nearest_tolerance",
    "w_sessionize_events",
    "pipe_recommend_audience",
]
GRAPH_ROWS = ["graph_build_auto", "graph_serve_auto", "graph_insert_auto"]


def _graph_ops(spark, sf_dir: str, state: dict):
    """Operator-level graph trio with the auto band knob; build result is
    cached in ``state`` so serve/insert measure their own cost only."""
    from pyspark.sql import functions as F

    from vector_search_spark.config import EMB_DIM
    from vector_search_spark.operators.ann import (
        auto_band_bits,
        corpus_band_keys,
        knn_graph_build,
        knn_graph_insert,
        knn_graph_serve,
    )
    from vector_search_spark.sources.catalog import load_table

    key = sf_dir
    if key not in state:
        emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(
            eager=True
        )
        n = emb.count()
        bb = auto_band_bits(n)
        npl = bb * 4
        state[key] = {"emb": emb, "n": n, "bb": bb, "npl": npl}
    st = state[key]

    def build():
        g = knn_graph_build(
            st["emb"], k=6, n_planes=st["npl"], band_bits=st["bb"],
            rounds=2, seed=42, dim=EMB_DIM,
        ).localCheckpoint(eager=True)
        st["graph"] = g
        return g.count()

    def _ensure_graph():
        # serve/insert depend on the built graph; when the CLI row subset
        # omits graph_build_auto, build it lazily (untimed by the caller's
        # clock only if build ran first — the lazy path is a convenience,
        # and the probe prints per-row walls so a lazy build shows up in
        # the first dependent row rather than as a KeyError). ADVICE r9.
        if "graph" not in st:
            build()

    def serve():
        _ensure_graph()
        probes = st["emb"].filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_vec"),
        )
        return knn_graph_serve(
            st["graph"], st["emb"], probes, k=10, beam=8, rounds=2,
            entries="lsh", n_planes=st["npl"], band_bits=st["bb"],
            seed=42, dim=EMB_DIM,
        ).count()

    def insert():
        _ensure_graph()
        if "bands" not in st:
            st["base"] = st["emb"].filter(
                F.col("vec_id") >= 20
            ).localCheckpoint(eager=True)
            st["bands"] = corpus_band_keys(
                st["base"], n_planes=st["npl"], band_bits=st["bb"],
                seed=42, dim=EMB_DIM,
            ).localCheckpoint(eager=True)
        return knn_graph_insert(
            st["graph"], st["base"],
            st["emb"].filter(F.col("vec_id") < 20),
            k=6, n_planes=st["npl"], band_bits=st["bb"], seed=42,
            dim=EMB_DIM, corpus_bands=st["bands"],
        ).count()

    return {"graph_build_auto": build, "graph_serve_auto": serve,
            "graph_insert_auto": insert}


def main() -> None:
    dir10 = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/repo/.scratch/sfx10_zipf"
    )
    dir100 = sys.argv[2] if len(sys.argv) > 2 else (
        "/root/repo/.scratch/sfx100_zipf"
    )
    rows = sys.argv[3:] or (REGISTRY_ROWS + GRAPH_ROWS)
    spark = ui_skew_session("probe_100x")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    from vector_search_spark.plans.queries import QUERIES

    from vector_search_spark.utils import parquet_scan_units

    # layout facts FIRST: a table whose row-group count is below the
    # core count caps scan parallelism no matter the plan (SCALING.md
    # round 9 — the t_sequence_packing 410x "imbalance" was one row
    # group, not the operator). Read these before reading any skew row.
    for d in (dir10, dir100):
        for t in ("documents", "embeddings", "events", "lineitem"):
            p = os.path.join(d, f"{t}.parquet")
            if os.path.exists(p):
                nf, rgs = parquet_scan_units(p)
                print(json.dumps(
                    {"layout": f"{d}/{t}", "files": nf, "row_groups": rgs}
                ), flush=True)

    gstate: dict = {}
    for name in rows:
        rec = {"op": name}
        for tag, d in (("x10", dir10), ("x100", dir100)):
            if name in GRAPH_ROWS:
                fn = _graph_ops(spark, d, gstate)[name]
                run = fn
            else:
                qfn = QUERIES[name].fn
                run = lambda qfn=qfn, d=d: qfn(spark, d).collect()
            floor = completed_stage_count(UI_PORT)
            t0 = time.perf_counter()
            run()
            rec[f"{tag}_s"] = round(time.perf_counter() - t0, 2)
            stage_id, q = heaviest_stage_task_quantiles(UI_PORT, floor)
            rec[f"{tag}_task_min_p50_max"] = q
            rec[f"{tag}_max_over_p50"] = round(q[2] / max(q[1], 0.01), 1)
        rec["ratio"] = round(rec["x100_s"] / max(rec["x10_s"], 1e-9), 1)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
