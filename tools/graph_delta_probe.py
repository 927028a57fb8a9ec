"""Measure the durable graph-ingest DELTA publish (VERDICT r10 next #1
"Done" evidence): per-batch snapshot bytes must scale with the BATCH,
not the index.

Drives ``DurableGraphIngest.ingest_batch`` directly (no stream engine —
this probe measures the publish, not the trigger plumbing) at a given
fixture with AUTO band bits (the deployment config; the registry row
pins band_bits=6 for its DuckDB replay, which at fixture scale makes
every touched set a large corpus fraction). Prints per batch: publish
mode, wall, delta rows and bytes on disk; then the base snapshot bytes
and the ratio.

Usage: python tools/graph_delta_probe.py [sf_dir] [n_new] [n_batches]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def du(p: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p)
        for f in fs
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from vector_search_spark.config import EMB_DIM
    from vector_search_spark.operators.ann import auto_band_bits
    from vector_search_spark.session import get_spark
    from vector_search_spark.sources.catalog import load_table
    from vector_search_spark.streaming.serving import DurableGraphIngest
    from vector_search_spark.utils import pid_scratch

    spark = get_spark("graph_delta_probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    base = emb.filter(F.col("vec_id") >= n_new).localCheckpoint(eager=True)
    bb = auto_band_bits(n - n_new)
    state = pid_scratch("gdelta_probe", sf_dir)
    print(
        f"corpus={n - n_new} new={n_new} batches={n_batches} "
        f"band_bits={bb} (auto) planes={bb * 4} dim={EMB_DIM}"
    )
    import time

    t0 = time.perf_counter()
    ing = DurableGraphIngest(
        base, state, k=6, n_planes=bb * 4, band_bits=bb, seed=42,
        dim=EMB_DIM, rounds=2,
    )
    print(
        f"deploy (build + base publish): {time.perf_counter() - t0:.2f}s; "
        f"base publish alone {ing.publish_secs:.2f}s"
    )
    gdir = ing.graph_dir
    m = ing.log.read_marker()
    base_bytes = du(os.path.join(gdir, f"base-b{m['base']}"))
    print(f"base snapshot: {m['base_rows']} rows, {base_bytes / 1024:.1f} KiB")
    for b in range(n_batches):
        batch = emb.filter(
            (F.col("vec_id") < n_new) & (F.col("vec_id") % n_batches == b)
        )
        ing.ingest_batch(batch, b)
        mode, el = ing.publish_modes[-1]
        m = ing.log.read_marker()
        dpath = os.path.join(gdir, f"delta-b{b}")
        if mode == "delta" and os.path.isdir(dpath):
            dbytes = du(dpath)
            print(
                f"batch {b}: n={batch.count()} mode=delta publish={el:.2f}s "
                f"delta_bytes={dbytes / 1024:.1f} KiB "
                f"({100 * dbytes / base_bytes:.2f}% of base) "
                f"cum_delta_rows={m['delta_rows']}"
            )
        else:
            print(
                f"batch {b}: n={batch.count()} mode={mode} publish={el:.2f}s "
                f"(policy fold; base_rows={m['base_rows']})"
            )
    print(f"total publish wall: {ing.publish_secs:.2f}s; marker: {m}")


if __name__ == "__main__":
    main()
