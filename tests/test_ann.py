"""ANN recall tests: approximate results vs exact brute-force KNN."""

from pyspark.sql import functions as F

from vector_search_spark.operators.ann import (
    hyperplane_lsh_knn,
    ivf_assign,
    ivf_knn,
    make_planes,
)
from vector_search_spark.operators.knn import knn
from vector_search_spark.sources.catalog import load_table


def _probes(emb, n):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )


def _exact_topk(emb, probes, k):
    out = {}
    for r in knn(emb, probes, k=k).collect():
        out.setdefault(r.probe_id, []).append(r.vec_id)
    return out


def test_ivf_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = _probes(emb, 5)
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    assigned = ivf_assign(emb, cents)
    # every corpus row lands in exactly one bucket
    assert assigned.count() == emb.count()
    approx = {}
    for r in ivf_knn(assigned, cents, probes, k=10, n_probe=8).collect():
        approx.setdefault(r.probe_id, set()).add(r.vec_id)
    exact = _exact_topk(emb, probes, 10)
    # probing half the centroids must recover the probe itself (cos=1) and
    # a reasonable share of true neighbors
    recalls = []
    for pid, want in exact.items():
        got = approx.get(pid, set())
        assert pid in got  # self-hit always in its own centroid bucket
        recalls.append(len(got & set(want)) / len(want))
    assert sum(recalls) / len(recalls) >= 0.3


def test_lsh_self_hit_and_soundness(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = _probes(emb, 5)
    res = hyperplane_lsh_knn(emb, probes, k=10, n_planes=6, dim=64)
    rows = res.collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for pid, rs in by_probe.items():
        ids = [r.vec_id for r in rs]
        assert pid in ids  # identical vector → identical bucket
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_planes_deterministic():
    assert make_planes(4, 8, 1) == make_planes(4, 8, 1)
    assert make_planes(4, 8, 1) != make_planes(4, 8, 2)


def test_ivf_persisted_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The persisted IVF index must (a) return the same results as the
    in-memory assignment and (b) prune the probe scan to the probed
    centroid partitions (PartitionFilters present, dynamic or pushed)."""
    from vector_search_spark.operators.ann import ivf_build_index, ivf_probe_index

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    probes = _probes(emb, 3)

    path = str(tmp_path / "ivf_index")
    ivf_build_index(emb, cents, path)

    got_df = ivf_probe_index(spark, path, cents, probes, k=5, n_probe=2)
    got_df.collect()
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan  # DPP prunes to probed buckets

    assigned = ivf_assign(emb, cents)
    want_df = ivf_knn(assigned, cents, probes, k=5, n_probe=2)
    got = {(r.probe_id, r.vec_id) for r in got_df.collect()}
    want = {(r.probe_id, r.vec_id) for r in want_df.collect()}
    assert got == want and len(got) == 15


def test_kmeans_trained_ivf_index(spark, sf_dir):
    """MLlib-KMeans-trained centroids drive a working IVF index: full
    corpus coverage, k populated buckets, and usable recall at n_probe=4.

    NB: on this fixture (uniform random unit vectors — no cluster
    structure) trained centroids do NOT beat sampled corpus vectors;
    KMeans' balance/recall advantage only exists when the data has
    clusters. The test therefore asserts functional correctness, not
    superiority."""
    from vector_search_spark.operators.ann import ivf_assign, ivf_knn
    from vector_search_spark.operators.ann_mllib import kmeans_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    probes = _probes(emb, 5)
    exact = _exact_topk(emb, probes, 10)

    trained = kmeans_centroids(emb, k=16)
    assigned = ivf_assign(emb, trained)
    assert assigned.count() == emb.count()  # every row lands in a bucket
    assert assigned.select("centroid_id").distinct().count() == 16

    got = {}
    for r in ivf_knn(assigned, trained, probes, k=10, n_probe=4).collect():
        got.setdefault(r.probe_id, []).append(r.vec_id)
    hits = sum(len(set(got.get(p, [])) & set(exact[p])) for p in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.4  # 4/16 buckets probed on structureless data


def test_pq_encode_arrow_matches_jvm(spark, sf_dir):
    """The Arrow/numpy pq_encode fast path must pick bit-identical codes
    to the dependency-free JVM fold path: same IEEE op sequence (see
    pq_encode docstring), same first-minimum tie-break."""
    from vector_search_spark.operators.ann import pq_encode
    from vector_search_spark.utils import fan_out

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    aux = {r["vec_id"]: r["e"] for r in emb.filter(F.col("vec_id") < 16).collect()}
    codebook = {
        s: {c: aux[c][s * 16:(s + 1) * 16] for c in sorted(aux)} for s in range(4)
    }

    def as_map(df):
        return {
            r["vec_id"]: (r["code0"], r["code1"], r["code2"], r["code3"])
            for r in df.collect()
        }

    arrow = as_map(pq_encode(fan_out(emb), codebook, corpus_vec="e"))
    jvm = as_map(pq_encode(emb, codebook, corpus_vec="e", use_arrow=False))
    assert len(arrow) > 0
    assert arrow == jvm


def test_ivf_pq_encode_matches_jvm_composition(spark, sf_dir):
    """The fused Arrow IVF-PQ build must equal the composition of the two
    JVM reference paths: ivf_assign (cosine argmax, cid tie-break) for
    the centroid column, pq_encode(use_arrow=False) for the codes."""
    from vector_search_spark.operators.ann import (
        ivf_assign,
        ivf_pq_encode,
        pq_encode,
    )
    from vector_search_spark.utils import fan_out

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    aux = {r["vec_id"]: r["e"] for r in emb.filter(F.col("vec_id") < 16).collect()}
    codebook = {
        s: {c: aux[c][s * 16:(s + 1) * 16] for c in sorted(aux)} for s in range(4)
    }
    fused = {
        r["vec_id"]: (r["centroid_id"], r["code0"], r["code1"], r["code2"], r["code3"])
        for r in ivf_pq_encode(fan_out(emb), codebook, aux, corpus_vec="e").collect()
    }
    cents = spark.createDataFrame(
        [(c, aux[c]) for c in sorted(aux)], "centroid_id long, centroid_vec array<double>"
    )
    assign = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(emb, cents, corpus_vec="e").collect()
    }
    codes = {
        r["vec_id"]: (r["code0"], r["code1"], r["code2"], r["code3"])
        for r in pq_encode(emb, codebook, corpus_vec="e", use_arrow=False).collect()
    }
    assert len(fused) > 0
    assert fused == {
        vid: (assign[vid], *codes[vid]) for vid in assign
    }
