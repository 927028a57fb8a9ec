"""10x ENGINE-SIDE adjudication for ``v_index_service_lifecycle``
(VERDICT r13 #4 — close the facade's >=10x value gap without DuckDB).

The composed-facade row is value-certified tri-scale
(sf0.001/0.01/0.1), but its DuckDB oracle — TWO pinned-band graph
replays — is measured infeasible at 10x (78 GB spill, 1406 s,
parity_10x_r13.log), so the facade carried only the PARTS' band-8
adjudication as a scale proxy. This tool closes the gap the way the
chain row's 100x gap was closed (``adjudicate_chain_100x.py``): an
exact engine-vs-engine compare that needs no SQL replay.

The facade's contract is that it ADDS NO CODE PATH — open routes to the
same ``knn_graph_build``, serve to the same ``knn_graph_serve``, and
compact/recover must restore exactly the rebuild-on-survivors state
through the delta log. So at 10x:

1. drive the FACADE through the gate row's exact lifecycle —
   open(mutable, state_dir, pinned band-8 params) -> serve ->
   insert(20) -> delete(vec_id % 16 = 7) -> compact -> recover in a
   fresh handle -> serve;
2. compute the CERTIFIED PARTS directly — ``knn_graph_build`` + serve
   over the base corpus (phase 0) and over the survivors (phase 1),
   same pinned knobs (band-8: the graph family's standing >=10x
   adjudication protocol — both arms pay identical banding, so the
   comparison is knob-invariant);
3. compare (phase, probe_id, vec_id, score) EXACTLY — same JVM fold on
   both arms, so even the float scores must be bit-identical; any
   divergence (an id lost through the delta log, a stale tombstone, a
   recovery mis-fold, a partition-count-induced tie drift) fails loud.

Usage:
    python tools/probes/facade_adjudication_10x.py [fixture] [n_planes] [band_bits]
defaults: .scratch/sfx10 32 8
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sfx10"
    n_planes = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    band_bits = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_PARITY_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .appName("facade_adjudication_10x")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vector_search_spark.config import EMB_DIM
    from vector_search_spark.operators.ann import (
        knn_graph_build,
        knn_graph_serve,
    )
    from vector_search_spark.operators.index_service import VectorIndexService
    from vector_search_spark.sources.catalog import load_table

    from tools.parity import fixture_gen

    print(f"# fixture_gen={fixture_gen(fixture)} dir={fixture}")
    emb = load_table(spark, fixture, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    base = emb.filter(F.col("vec_id") >= 20)
    probes = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 23)
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    params = {
        "k": 6, "n_planes": n_planes, "band_bits": band_bits, "rounds": 2,
    }
    print(
        f"# fixture={fixture} rows={n} dim={EMB_DIM} "
        f"planes={n_planes} band_bits={band_bits}"
    )

    # -- facade arm: the gate row's exact lifecycle -----------------------
    state = tempfile.mkdtemp(prefix="facade_adj_")
    t0 = time.time()
    svc = VectorIndexService.open(
        base, dim=EMB_DIM, mutable=True, state_dir=state, k=10,
        graph_params=params,
    )
    f0 = {
        (0, r.probe_id, r.vec_id, r.score)
        for r in svc.serve(probes).collect()
    }
    svc.insert(emb.filter(F.col("vec_id") < 20))
    svc.delete(emb.filter(F.col("vec_id") % 16 == 7).select("vec_id"))
    svc.compact()
    svc2 = VectorIndexService.recover(spark, state, k=10)
    f1 = {
        (1, r.probe_id, r.vec_id, r.score)
        for r in svc2.serve(probes).collect()
    }
    t_facade = time.time() - t0
    print(
        f"facade: phase0={len(f0)} phase1={len(f1)} rows [{t_facade:.1f}s]"
    )

    # -- parts arm: certified build+serve over base and survivors --------
    t0 = time.time()
    g0 = knn_graph_build(
        base, k=6, n_planes=n_planes, band_bits=band_bits, rounds=2,
        seed=42, dim=EMB_DIM,
    ).localCheckpoint(eager=True)
    p0 = {
        (0, r.probe_id, r.vec_id, r.score)
        for r in knn_graph_serve(
            g0, base, probes, k=10, beam=8, rounds=2, entries="lsh",
            n_planes=n_planes, band_bits=band_bits, seed=42, dim=EMB_DIM,
        ).collect()
    }
    surv = emb.filter(F.col("vec_id") % 16 != 7)
    g1 = knn_graph_build(
        surv, k=6, n_planes=n_planes, band_bits=band_bits, rounds=2,
        seed=42, dim=EMB_DIM,
    ).localCheckpoint(eager=True)
    p1 = {
        (1, r.probe_id, r.vec_id, r.score)
        for r in knn_graph_serve(
            g1, surv, probes, k=10, beam=8, rounds=2, entries="lsh",
            n_planes=n_planes, band_bits=band_bits, seed=42, dim=EMB_DIM,
        ).collect()
    }
    t_parts = time.time() - t0
    print(f"parts: phase0={len(p0)} phase1={len(p1)} rows [{t_parts:.1f}s]")

    got, want = f0 | f1, p0 | p1
    if got == want:
        print(
            f"PASS  v_index_service_lifecycle (adjudicated 10x): "
            f"{len(got)} rows exact (ids AND scores bit-identical) vs "
            f"certified parts build+serve over base/survivors"
        )
        return
    ids_got = {(p, q, v) for (p, q, v, _) in got}
    ids_want = {(p, q, v) for (p, q, v, _) in want}
    if ids_got == ids_want:
        print(
            f"FAIL  v_index_service_lifecycle (adjudicated 10x): id sets "
            f"match but {len(got - want)} scores differ — float-channel "
            f"drift, investigate fold paths"
        )
    else:
        print(
            f"FAIL  v_index_service_lifecycle (adjudicated 10x): "
            f"facade={len(got)} parts={len(want)} "
            f"extra={sorted(ids_got - ids_want)[:5]} "
            f"missing={sorted(ids_want - ids_got)[:5]}"
        )
    sys.exit(1)


if __name__ == "__main__":
    main()
