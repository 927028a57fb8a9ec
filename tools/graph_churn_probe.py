"""Tombstone-decay churn probe (VERDICT r9 next #2): run an N-round
insert/delete churn over a clustered corpus through GraphMaintainer and
measure, per round, (a) serve recall of the maintained graph vs exact
brute-force over the CURRENT corpus and (b) per-node edge recall of the
maintained adjacency vs a fresh rebuild on the same corpus — once with
the compaction policy enabled and once without.

The curve this prints is the SCALING.md round-10 evidence for the
compaction trigger: incremental maintenance alone decays (inserted
nodes never receive NN-descent refinement; delete repair pools miss
NN-descent edges), and rebuild-on-survivors at the churn-fraction
threshold restores build quality.

Usage: python tools/graph_churn_probe.py [rounds] [churn_per_round]
Prints one JSON line per (arm, round).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def clustered(rng, n, dim, ncl, spread=0.3, cents=None):
    if cents is None:
        cents = rng.randn(ncl, dim)
    X = np.stack([cents[i % ncl] + spread * rng.randn(dim) for i in range(n)])
    return cents, X / np.linalg.norm(X, axis=1, keepdims=True)


def exact_topk(corpus_vecs: dict, probe_vecs: np.ndarray, k: int):
    ids = np.array(sorted(corpus_vecs))
    M = np.stack([corpus_vecs[i] for i in ids])
    sims = probe_vecs @ M.T
    out = []
    for r in range(len(probe_vecs)):
        order = np.lexsort((ids, -sims[r]))[:k]
        out.append(set(ids[order]))
    return out


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    churn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n, dim, ncl, k, serve_k = 400, 32, 20, 5, 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vector_search_spark.operators.ann import knn_graph_build
    from vector_search_spark.operators.graph_lifecycle import GraphMaintainer

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("graph_churn_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(61)
    cents, X0 = clustered(rng, n, dim, ncl)
    probe_rng = np.random.RandomState(62)
    _, PV = clustered(probe_rng, 24, dim, ncl, cents=cents)

    def mkdf(ids, vecs):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
            "vec_id long, embedding array<float>",
        )

    probes = spark.createDataFrame(
        [(i, [float(x) for x in PV[i]]) for i in range(len(PV))],
        "probe_id long, probe_vec array<float>",
    ).localCheckpoint(eager=True)

    kw = dict(dim=dim, k=k, n_planes=24, band_bits=6, seed=42,
              build_rounds=2)

    for arm, thresh in (("no_compact", 10.0), ("compact", 0.35)):
        rng_arm = np.random.RandomState(63)
        live = {i: X0[i] for i in range(n)}
        next_id = n
        gm = GraphMaintainer(
            mkdf(sorted(live), [live[i] for i in sorted(live)]),
            compact_churn_frac=thresh, **kw,
        )
        for rnd in range(1, n_rounds + 1):
            # delete the `churn` oldest ids, insert `churn` fresh ones
            dels = sorted(live)[:churn]
            _, newX = clustered(rng_arm, churn, dim, ncl, cents=cents)
            new_ids = list(range(next_id, next_id + churn))
            next_id += churn
            gm.delete(mkdf(dels, [live[i] for i in dels]).select("vec_id"))
            for i in dels:
                del live[i]
            gm.insert(mkdf(new_ids, newX))
            for j, i in enumerate(new_ids):
                live[i] = newX[j]
            churn_frac = gm.churn_frac
            compacted = gm.maybe_compact()

            served = gm.serve(probes, k=serve_k, beam=8, rounds=2).collect()
            got = {}
            for r in served:
                got.setdefault(r.probe_id, set()).add(r.vec_id)
            want = exact_topk(live, PV, serve_k)
            s_hits = sum(len(got.get(p, set()) & want[p]) for p in range(len(PV)))
            serve_recall = s_hits / (len(PV) * serve_k)

            rebuilt = knn_graph_build(
                gm.corpus, rounds=2, k=k, n_planes=24, band_bits=6,
                seed=42, dim=dim,
            ).collect()
            fresh = {}
            for r in rebuilt:
                fresh.setdefault(r.src_id, set()).add(r.nbr_id)
            cur = {}
            for r in gm.graph.collect():
                cur.setdefault(r.src_id, set()).add(r.nbr_id)
            e_hits = sum(len(cur.get(s, set()) & fresh[s]) for s in fresh)
            e_tot = sum(len(v) for v in fresh.values())
            print(json.dumps({
                "arm": arm, "round": rnd,
                "churn_frac": round(churn_frac, 3),
                "compacted": compacted,
                "compactions": gm.compactions,
                "serve_recall": round(serve_recall, 3),
                "edge_recall_vs_rebuild": round(e_hits / e_tot, 3),
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
