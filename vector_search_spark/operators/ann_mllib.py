"""MLlib-backed ANN (the BASELINE.json "MLlib batch vector indexing" path).

``BucketedRandomProjectionLSH`` hashes L2-normalized vectors (cosine order ≡
euclidean order on the unit sphere, functions.vector.l2_normalize) into
buckets; ``approxSimilarityJoin`` produces candidate pairs with distances.
Seeded → deterministic, but the hash family is JVM-internal, so these are
rows-only on the correctness surface; tests check recall against exact KNN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import l2_normalize


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    seed: int = 42,
    corpus_vec: str = "embedding",
    max_iter: int = 20,
) -> DataFrame:
    """Train IVF centroids with MLlib KMeans over L2-normalized vectors
    (the batch index build of the north-star 'MLlib batch vector indexing'
    approach). Returns (centroid_id, centroid_vec) ready for
    ``operators.ann.ivf_assign`` / ``ivf_knn`` — trained centroids track
    the data distribution, so bucket sizes balance and recall at a given
    n_probe beats arbitrary seed vectors."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from pyspark.sql import functions as F2

    from ..utils import fan_out

    # fan_out BEFORE fit: a one-row-group parquet corpus scans as ONE
    # partition, and MLlib caches the training input at that layout — so
    # the interpreted l2_normalize fold AND every Lloyd iteration's
    # assignment pass serialize through one task (100x probe r9; the
    # fanned-out fit measures 17.5 s at 200k x 64 incl. k-means|| init).
    train = fan_out(
        corpus.select(array_to_vector(l2_normalize(corpus_vec)).alias("features"))
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(train)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(
        rows, "centroid_id int, centroid_vec array<float>"
    ).select("centroid_id", F2.col("centroid_vec"))


def brp_lsh_neighbors(
    corpus: DataFrame,
    probes: DataFrame,
    threshold: float = 1.2,
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    seed: int = 42,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
) -> DataFrame:
    """Approximate neighbor pairs within euclidean ``threshold`` on the unit
    sphere (cosine ≥ 1 - threshold²/2). Returns probe_id, vec_id, eucl_dist,
    cosine_equiv."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(corpus_id),
        array_to_vector(l2_normalize(corpus_vec)).alias("features"),
    )
    p = probes.select(
        F.col(probe_id),
        array_to_vector(l2_normalize(probe_vec)).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    pairs = model.approxSimilarityJoin(p, c, threshold, distCol="eucl_dist")
    return pairs.select(
        F.col(f"datasetA.{probe_id}").alias(probe_id),
        F.col(f"datasetB.{corpus_id}").alias(corpus_id),
        F.col("eucl_dist"),
        (1 - F.col("eucl_dist") * F.col("eucl_dist") / 2).alias("cosine_equiv"),
    )
