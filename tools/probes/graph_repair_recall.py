"""Measure the graph-maintenance repair path's edge recall vs a fresh
rebuild, as a function of banding amplification (VERDICT r12 #5).

``knn_graph_insert``/``knn_graph_delete`` find repair candidates via ONE
banded signature pass — the same exponential-recall-decay exposure the
advisor flagged for single-table dedup LSH. The graph path's built-in
amplification is its BANDS: n_planes/band_bits disjoint band keys are
OR'd in the candidate join, so "n_tables" for this family = the band
count. This probe sweeps n_planes in {6, 12, 24, 48} at band_bits=6
(1/2/4/8 bands — the gate rows pin 24/6 = 4 bands) and reports, per
config:

- insert leg: build on base (corpus minus the newest 5%), insert the
  5% incrementally, rebuild on the full corpus; recall of the inserted
  nodes' edge sets vs the rebuild's (the quality a user loses by NOT
  rebuilding), plus whole-graph edge agreement;
- delete leg: build on the full corpus, tombstone 5% (vec_id % 20 = 3),
  repair; rebuild on survivors; recall of the AFFECTED survivors' edge
  sets vs the rebuild's.

Both compare against the SAME-config rebuild, so the number isolates
the repair path's candidate quality from the banding's own build-time
recall. Run on the zipf fixture (hot-label skew is the adversarial
case for bucketed candidates).

Usage: python tools/probes/graph_repair_recall.py [fixture] [n_planes...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

BAND_BITS = 6
K = 6
ROUNDS = 2
SEED = 42


def _edge_recall(repaired, rebuilt, node_filter=None):
    """|repaired ∩ rebuilt| / |rebuilt| over (src, nbr) edge sets,
    optionally restricted to a node subset (src in node_filter)."""
    a = repaired.select("src_id", "nbr_id")
    b = rebuilt.select("src_id", "nbr_id")
    if node_filter is not None:
        a = a.join(F.broadcast(node_filter), a.src_id == node_filter.nid, "left_semi")
        b = b.join(F.broadcast(node_filter), b.src_id == node_filter.nid, "left_semi")
    denom = b.count()
    hit = b.join(a, ["src_id", "nbr_id"], "left_semi").count()
    return hit / max(denom, 1), denom


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf01z"
    planes = [int(a) for a in sys.argv[2:]] or [6, 12, 24, 48]

    from vector_search_spark.config import EMB_DIM
    from vector_search_spark.operators.ann import (
        knn_graph_build,
        knn_graph_delete,
        knn_graph_insert,
    )
    from vector_search_spark.session import get_spark
    from vector_search_spark.sources.catalog import load_table

    spark = get_spark("graph_repair_recall", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, fixture, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    n_new = max(10, n // 20)  # 5% churn batches
    print(f"# fixture={fixture} n={n} batch={n_new} band_bits={BAND_BITS} "
          f"k={K} rounds={ROUNDS}")

    base = emb.filter(F.col("vec_id") >= n_new).localCheckpoint(eager=True)
    new = emb.filter(F.col("vec_id") < n_new).localCheckpoint(eager=True)
    new_ids = new.select(F.col("vec_id").alias("nid")).localCheckpoint(True)
    dels = emb.filter(F.col("vec_id") % 20 == 3).select("vec_id")
    surv = emb.filter(F.col("vec_id") % 20 != 3).localCheckpoint(eager=True)

    for np_ in planes:
        t0 = time.perf_counter()
        kw = dict(
            k=K, n_planes=np_, band_bits=BAND_BITS, seed=SEED, dim=EMB_DIM
        )
        # ---- insert leg
        g_base = knn_graph_build(base, rounds=ROUNDS, **kw).localCheckpoint(True)
        ins = knn_graph_insert(g_base, base, new, **kw).localCheckpoint(True)
        reb_full = knn_graph_build(emb, rounds=ROUNDS, **kw).localCheckpoint(True)
        r_new, d_new = _edge_recall(ins, reb_full, new_ids)
        r_all, d_all = _edge_recall(ins, reb_full)

        # ---- delete leg (affected survivors only)
        dl = knn_graph_delete(reb_full, emb, dels, **kw).localCheckpoint(True)
        reb_surv = knn_graph_build(surv, rounds=ROUNDS, **kw).localCheckpoint(True)
        affected = (
            reb_full.join(
                dels.select(F.col("vec_id").alias("did")),
                reb_full.nbr_id == F.col("did"),
                "left_semi",
            )
            .select(F.col("src_id").alias("nid"))
            .distinct()
            .join(
                dels.select(F.col("vec_id").alias("nid")), "nid", "left_anti"
            )
            .localCheckpoint(True)
        )
        r_aff, d_aff = _edge_recall(dl, reb_surv, affected)
        el = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "n_planes": np_,
                    "bands": np_ // BAND_BITS,
                    "insert_edge_recall_new": round(r_new, 4),
                    "insert_edges_new": d_new,
                    "whole_graph_agreement": round(r_all, 4),
                    "delete_edge_recall_affected": round(r_aff, 4),
                    "delete_edges_affected": d_aff,
                    "sec": round(el, 1),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
