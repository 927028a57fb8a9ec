"""Golden + property tests for the vector layer (SURVEY §5.2.2-3)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_spark.functions.vector import (
    cosine_sim,
    cosine_sim_pd,
    l2_norm,
    l2_normalize,
    vec_from_text,
    vec_to_text,
)
from vector_search_spark.operators.knn import knn, multiprobe_fusion
from vector_search_spark.sources.catalog import load_table


def _np_cosine(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_cosine_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe_vec")
    )
    got = (
        emb.crossJoin(F.broadcast(probe))
        .select("vec_id", cosine_sim("embedding", "probe_vec").alias("cos"))
        .collect()
    )
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.select("vec_id", "embedding").collect()}
    p = vecs[0]
    for r in got:
        assert abs(r.cos - _np_cosine(vecs[r.vec_id], p)) < 1e-9


def test_cosine_self_similarity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    rows = emb.select(cosine_sim("embedding", "embedding").alias("c")).collect()
    for r in rows:
        assert abs(r.c - 1.0) < 1e-12


def test_cosine_bounds(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    probe = emb.filter(F.col("vec_id") == 3).select(
        F.col("embedding").alias("probe_vec")
    )
    rows = (
        emb.crossJoin(F.broadcast(probe))
        .select(cosine_sim("embedding", "probe_vec").alias("c"))
        .collect()
    )
    for r in rows:
        assert -1.0 - 1e-12 <= r.c <= 1.0 + 1e-12


def test_hof_vs_pandas_udf(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    probe = emb.filter(F.col("vec_id") == 1).select(
        F.col("embedding").alias("probe_vec")
    )
    both = (
        emb.crossJoin(F.broadcast(probe))
        .select(
            cosine_sim("embedding", "probe_vec").alias("hof"),
            cosine_sim_pd("embedding", "probe_vec").alias("pd"),
        )
        .collect()
    )
    for r in both:
        assert abs(r.hof - r.pd) < 1e-9


def test_vec_text_roundtrip(spark):
    df = spark.createDataFrame([("[0.5, -1.25, 3.0]",)], ["txt"])
    row = df.select(
        vec_to_text(vec_from_text("txt")).alias("back"),
        vec_from_text("txt").alias("vec"),
    ).collect()[0]
    assert row.vec == [0.5, -1.25, 3.0]
    assert row.back == "[0.5,-1.25,3.0]"


def test_l2_normalize(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(10)
    rows = emb.select(l2_norm(l2_normalize("embedding")).alias("n")).collect()
    for r in rows:
        assert abs(r.n - 1.0) < 1e-5  # float32 storage precision


def test_knn_exact_vs_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    got = [r.vec_id for r in knn(emb, probes, k=5).orderBy(F.desc("score")).collect()]
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.select("vec_id", "embedding").collect()}
    p = vecs[7]
    want = sorted(vecs, key=lambda v: (-_np_cosine(vecs[v], p), v))[:5]
    assert got == want


def test_multiprobe_fusion_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    res = multiprobe_fusion(emb, probes, k=10, top_n=5, n_probes_norm=5).collect()
    assert len(res) == 5
    for r in res:
        assert 1 <= r.n_hits <= 5
        assert 0 <= r.match_pct <= 100.0 + 1e-9
    # probes see themselves with cosine 1.0 → the probe ids dominate
    scores = [r.fused_score for r in res]
    assert scores == sorted(scores, reverse=True)
