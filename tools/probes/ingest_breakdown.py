"""Decompose `s_graph_ingest_serve`'s wall time (VERDICT r11 #6): the
row is ~24% of the bench headline and its previously-reported split
stages summed to ~13 of ~20 s — this probe accounts for the rest by
phase, using the timing hooks on :class:`DurableGraphIngest`:

- setup: corpus/base localCheckpoints + writing the n_files source files
- band: the one-time Arrow corpus band hash
- base build: knn_graph_build over the base corpus (+ its base publish)
- drain: the availableNow stream; inside it, insert (graph work) and
  publish (delta durability) are metered, so
  floor = drain - insert - delta-publish is the streaming engine's
  per-trigger scheduling cost (~0.5-1 s/trigger, tools/serve_latency.py)
- serve: collecting the beam search over the grown graph

Usage: python tools/probes/ingest_breakdown.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from vector_search_spark.session import get_spark
    from vector_search_spark.streaming import serving

    spark = get_spark("ingest_breakdown", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the paths bench warms so the phase numbers match bench trials
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1,)], ["x"]).mapInPandas(
        lambda it: it, "x long"
    ).collect()

    t0 = time.perf_counter()
    res = serving.run_streaming_graph_ingest_availablenow(spark, sf_dir)
    t_build = time.perf_counter() - t0
    t1 = time.perf_counter()
    n = len(res.collect())
    t_serve = time.perf_counter() - t1
    total = time.perf_counter() - t0

    s = dict(serving.LAST_INGEST_STATS)
    delta_publish = sum(
        el for mode, el in s["modes"] if mode == "delta"
    )
    base_publish = sum(el for mode, el in s["modes"] if mode == "base")
    floor = s["drain_s"] - s["insert_s"] - delta_publish
    setup = t_build - s["band_s"] - s["base_build_s"] - base_publish - s["drain_s"]
    print(
        json.dumps(
            {
                "total_s": round(total, 2),
                "rows": n,
                "setup_s": round(setup, 2),
                "band_s": s["band_s"],
                "base_build_s": s["base_build_s"],
                "base_publish_s": round(base_publish, 2),
                "drain_s": s["drain_s"],
                "  drain.insert_s": s["insert_s"],
                "  drain.delta_publish_s": round(delta_publish, 2),
                "  drain.floor_s": round(floor, 2),
                "n_batches": s["n_batches"],
                "floor_per_trigger_s": round(
                    floor / max(s["n_batches"], 1), 2
                ),
                "serve_s": round(t_serve, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
