"""Measure pair RECALL of the guarded near-dup path vs the exact row
(ADVICE r11 medium): a single k-bit LSH table's collision probability is
(1-θ/π)^k, so the guard loses true near-dup pairs inside exactly the
oversized blocks it sub-buckets — and parity cannot see it because the
oracle replays the same approximation. This probe quantifies the loss
and the OR-amplification (``n_tables``) remedy:

- ground truth: ``embedding_neardup_pairs(max_block_size=None)`` —
  exact within-block pairs at the threshold;
- candidates: the guarded path at the gate row's knobs (imported from
  ``plans.queries`` so the probe can never silently measure a different
  configuration than the certified rows — ADVICE r12) for n_tables in
  {1, 2, 4, 8};
- recall = |guarded ∩ exact| / |exact|, reported overall AND restricted
  to OVERSIZED blocks (small blocks are exact in every variant, so the
  oversized-only number is the honest one);
- CHAIN recall (VERDICT r12 #1): the SemDeDup chain's user-visible
  output is cluster membership + keep/drop flags, so each variant also
  runs ``dup_clusters`` and reports (a) same-cluster pair recall —
  because guarded candidates are a SUBSET of the exact pairs, approx
  clusters REFINE exact clusters and the intersection count equals the
  approx count, so the ratio is computable from cluster-size histograms
  alone (sum of m·(m-1)/2) — and (b) drop recall — the fraction of docs
  the exact chain deduplicates away that the approx chain also drops
  (false drops are impossible under refinement).

Run at a fixture whose blocks actually exceed the bound — the zipf
fixtures (.scratch/sf01z) and the 10x replica (.scratch/sfx10) both
qualify; the 100x fixture's exact side is quadratic-prohibitive by the
documented exclusion contract.

Usage: python tools/recall_probe.py [fixture_dir] [n_tables ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# The gate rows' knobs, imported — NOT re-hardcoded — so a knob change in
# the certified rows cannot silently diverge this evidence (ADVICE r12).
from vector_search_spark.plans.queries import (  # noqa: E402
    _GUARD_BOUND as BOUND,
    _GUARD_FLOOR as FLOOR,
    _GUARD_THRESH as THRESH,
)


def _chain_stats(clusters) -> tuple[float, int, int]:
    """(same-cluster pairs, non-trivial clusters, dropped docs) of one
    dup_clusters output — sizes only, never pair enumeration."""
    agg = (
        clusters.groupBy("cluster_id")
        .count()
        .agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
            F.count("*").alias("clusters"),
        )
        .first()
    )
    drops = clusters.filter(F.col("id") != F.col("cluster_id")).count()
    return float(agg["pairs"] or 0.0), int(agg["clusters"]), drops


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf01z"
    tables = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8]

    from vector_search_spark.config import EMB_DIM
    from vector_search_spark.operators.dedup import (
        dup_clusters,
        embedding_neardup_pairs,
    )
    from vector_search_spark.session import get_spark
    from vector_search_spark.sources.catalog import load_table

    spark = get_spark("recall_probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, fixture, "embeddings")

    big_blocks = (
        emb.groupBy(F.col("label").alias("block"))
        .agg(F.count("*").alias("bn"))
        .filter(F.col("bn") > BOUND)
    )

    t0 = time.perf_counter()
    exact = (
        embedding_neardup_pairs(
            emb, threshold=THRESH, max_block_size=None, dim=EMB_DIM
        )
        .select("block", "id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    n_exact_big = exact.join(F.broadcast(big_blocks), "block", "left_semi").count()
    t_exact = time.perf_counter() - t0
    ex_cl = dup_clusters(exact).localCheckpoint(eager=True)
    ex_cpairs, ex_nclusters, ex_drops = _chain_stats(ex_cl)
    print(
        f"# fixture={fixture} exact_pairs={n_exact} "
        f"exact_pairs_oversized={n_exact_big} "
        f"exact_chain(clusters={ex_nclusters} drops={ex_drops} "
        f"cluster_pairs={ex_cpairs:.0f}) [{t_exact:.1f}s]"
    )

    for r in tables:
        t0 = time.perf_counter()
        g = (
            embedding_neardup_pairs(
                emb,
                threshold=THRESH,
                max_block_size=BOUND,
                n_planes=FLOOR,
                dim=EMB_DIM,
                n_tables=r,
            )
            .select("block", "id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        n_g = g.count()
        hit = g.join(exact, ["block", "id_a", "id_b"], "left_semi")
        n_hit = hit.count()
        n_hit_big = hit.join(
            F.broadcast(big_blocks), "block", "left_semi"
        ).count()
        g_cl = dup_clusters(g.select("id_a", "id_b"))
        g_cpairs, g_nclusters, g_drops = _chain_stats(g_cl)
        el = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "n_tables": r,
                    "pairs": n_g,
                    "recall_overall": round(n_hit / max(n_exact, 1), 4),
                    "recall_oversized": round(
                        n_hit_big / max(n_exact_big, 1), 4
                    ),
                    "chain_cluster_pair_recall": round(
                        g_cpairs / max(ex_cpairs, 1.0), 4
                    ),
                    "chain_drop_recall": round(
                        g_drops / max(ex_drops, 1), 4
                    ),
                    "chain_clusters": g_nclusters,
                    "chain_drops": g_drops,
                    "sec": round(el, 1),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
