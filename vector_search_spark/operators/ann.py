"""Approximate nearest-neighbor operators — the 100 TB path for V3.

Brute-force KNN (operators.knn) scans the corpus once per probe batch; at
100 TB the scan itself is the bottleneck. Two classic batch-index designs,
both pure DataFrame ops:

- ``hyperplane_lsh_knn``: random-hyperplane LSH for cosine. Signature =
  sign-bits of dot(v, plane_i). Build: one map pass. Query: probes hash to
  buckets, candidates come from a bucket equi-join (shuffle on signature,
  not all-pairs), exact cosine re-rank inside the bucket. Deterministic
  planes (seeded) so results are reproducible and oracle-checkable.
- ``ivf_knn``: inverted-file index. Corpus rows are assigned to their
  nearest centroid; a query probes only the ``n_probe`` closest centroids'
  buckets. At scale the assignment table is written bucketed/partitioned by
  ``centroid_id`` so bucket probes become partition-pruned scans.

For production, MLlib's ``BucketedRandomProjectionLSH`` over L2-normalized
vectors (cosine ≡ monotone in euclidean on the unit sphere) is the same
shape with library-managed hashing — see ``ann_mllib.py``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine_sim, dot, l2_norm
from .knn import topk_per_key


def make_planes(n_planes: int = 8, dim: int = 64, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return [[float(x) for x in rng.randn(dim)] for _ in range(n_planes)]


def _plane_lit(plane: list[float]) -> F.Column:
    return F.array(*[F.lit(x) for x in plane])


def lsh_signature(vec_col, planes: list[list[float]]) -> F.Column:
    """Bit i set iff dot(vec, plane_i) > 0 — integer bucket id."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        bit = F.when(dot(vec_col, _plane_lit(plane)) > 0, F.lit(1 << i)).otherwise(0)
        sig = sig + bit
    return sig


def hyperplane_lsh_knn(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
) -> DataFrame:
    """Approximate KNN: candidates share the probe's LSH bucket, then exact
    cosine re-rank. Recall trades off with n_planes (more planes → smaller
    buckets → faster, lower recall). ``dim`` is REQUIRED: sniffing it from
    the data would be a driver-side action at plan-build time, and silently
    mis-sized planes degenerate the signature."""
    if dim is None:
        raise ValueError(
            "hyperplane_lsh_knn requires dim= (the embedding dimensionality); "
            "refusing to sniff it from the data at plan-build time"
        )
    planes = make_planes(n_planes, dim, seed)
    c = corpus.withColumn("_sig", lsh_signature(F.col(corpus_vec), planes))
    p = probes.withColumn("_sig", lsh_signature(F.col(probe_vec), planes))
    joined = c.join(F.broadcast(p), "_sig")
    scored = joined.withColumn(
        "score", cosine_sim(corpus_vec, probe_vec)
    ).drop("_sig")
    return topk_per_key(scored, [probe_id], "score", k, tiebreak=[corpus_id])


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """Assign every corpus row to its nearest centroid (index build).

    One broadcast pass + a per-row argmax (window over C candidates).
    Deterministic tie-break on centroid id.
    """
    scored = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "_cscore", cosine_sim(corpus_vec, centroid_vec)
    )
    best = topk_per_key(
        scored, [corpus_id], "_cscore", 1, tiebreak=[centroid_id], two_phase=False
    )
    return best.select(corpus_id, corpus_vec, centroid_id)


def ivf_build_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    **assign_kwargs,
) -> None:
    """Persist the IVF assignment table partitioned by centroid id. At
    100 TB this is the batch index build: a probe that touches ``n_probe``
    centroids then reads only those directories — partition pruning turns
    bucket probes into O(bucket) scans instead of a full corpus pass."""
    centroid_id = assign_kwargs.get("centroid_id", "centroid_id")
    assigned = ivf_assign(corpus, centroids, **assign_kwargs)
    assigned.write.mode("overwrite").partitionBy(centroid_id).parquet(path)


def ivf_probe_index(
    spark,
    path: str,
    centroids: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    **kwargs,
) -> DataFrame:
    """Query a persisted IVF index. The centroid-id filter lands on the
    partition column, so the scan prunes to the probed buckets (verify:
    PartitionFilters in the plan)."""
    assigned = spark.read.parquet(path)
    return ivf_knn(assigned, centroids, probes, k=k, n_probe=n_probe, **kwargs)


def ivf_knn(
    corpus_assigned: DataFrame,
    centroids: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
) -> DataFrame:
    """IVF query: per probe, rank centroids, take top n_probe, search only
    rows assigned to those centroids, exact re-rank to top-k."""
    cent_scored = probes.crossJoin(F.broadcast(centroids)).withColumn(
        "_pscore", cosine_sim(probe_vec, centroid_vec)
    )
    probe_cents = topk_per_key(
        cent_scored, [probe_id], "_pscore", n_probe,
        tiebreak=[centroid_id], two_phase=False,
    ).select(probe_id, probe_vec, centroid_id)

    cands = corpus_assigned.join(
        F.broadcast(probe_cents), centroid_id
    )
    scored = cands.withColumn("score", cosine_sim(corpus_vec, probe_vec))
    return topk_per_key(scored, [probe_id], "score", k, tiebreak=[corpus_id]).select(
        probe_id, corpus_id, "score"
    )
