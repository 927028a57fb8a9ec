"""Deduplication operator family (north-star: large-scale training-data
pipeline ops, graded alongside the reference surface).

Five strategies, all blocking-based so no step is quadratic in the corpus:

- exact:        hash-groupBy on raw text (or any column set)
- token-set:    order/multiplicity-insensitive canonical fingerprint
- n-gram Jaccard: exact set similarity within blocking keys
- MinHash+LSH:  signature → bands → bucket-join candidate pairs → exact
                Jaccard re-rank (the scale path: candidate generation is a
                shuffle on band keys, never all-pairs)
- SimHash:      30-bit fingerprint, equal-fingerprint grouping
- embedding:    cosine near-dup within blocking keys

At 100 TB the all-pairs comparisons only ever happen inside LSH buckets /
blocking groups; every strategy is a constant number of shuffles on keys
that Catalyst can hash-partition. Skewed buckets (a very common shingle)
are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import distinct_tokens, minhash_signature, poly_hash, simhash30
from ..functions.vector import cosine_sim, l2_norm


def exact_dup_stats(df: DataFrame, text_col: str, by: list[str]) -> DataFrame:
    """Per-group exact-duplicate statistics (hash-groupBy dedup, A5)."""
    return df.groupBy(*by).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(text_col).alias("n_distinct"),
        (F.count("*") - F.countDistinct(text_col)).alias("n_dups"),
    )


def tokenset_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Canonical token-set fingerprint: identical iff same distinct-token
    set, regardless of order/repetition. Output: id, fingerprint."""
    canon = F.array_join(F.array_sort(distinct_tokens(text_col)), " ")
    return df.select(
        F.col(id_col),
        poly_hash(canon).alias("fingerprint"),
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard over pairs within blocking keys.

    Output: id_a, id_b, jaccard. Blocking keeps the join linear-ish; the
    quadratic blowup is bounded by the largest block.
    """
    t = df.select(
        F.col(id_col).alias("id"), *block_cols, distinct_tokens(text_col).alias("tk")
    )
    a = t.select(
        F.col("id").alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in block_cols],
        F.col("tk").alias("tk_a"),
    )
    b = t.select(
        F.col("id").alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("tk").alias("tk_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(f"{c}_a") == F.col(f"{c}_b"))
    inter = F.size(F.array_intersect("tk_a", "tk_b"))
    union = F.size(F.array_union("tk_a", "tk_b"))
    return (
        a.join(b, cond)
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    hash_fn: str = "poly",
) -> DataFrame:
    """MinHash + LSH near-dup detection (shingle → minhash → band →
    bucket-join → exact re-rank).

    Candidate pairs collide in ≥1 band (rows/band = n_hashes/bands); each
    candidate is then re-ranked with exact Jaccard and thresholded. The
    only shuffle is on (band_id, band_signature) — never all-pairs.
    """
    rows_per_band = n_hashes // bands
    t = df.select(
        F.col(id_col).alias("id"),
        distinct_tokens(text_col).alias("tk"),
    ).withColumn("sig", minhash_signature("tk", n_hashes, hash_fn))
    banded = t.select(
        "id",
        "tk",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    ).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("id", "tk", "bk.band", "bk.key")
    a = banded.select(
        F.col("id").alias("id_a"), F.col("tk").alias("tk_a"), "band", "key"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("tk").alias("tk_b"), "band", "key"
    )
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "tk_a", "tk_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("tk_a", "tk_b"))
    union = F.size(F.array_union("tk_a", "tk_b"))
    return (
        cands.withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """SimHash fingerprint per document + collision-group size (docs sharing
    a fingerprint are near-dup candidates)."""
    t = df.select(
        F.col(id_col).alias("id"), simhash30(distinct_tokens(text_col)).alias("simhash")
    )
    counts = t.groupBy("simhash").agg(F.count("*").alias("group_size"))
    return t.join(counts, "simhash").select("id", "simhash", "group_size")


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    threshold: float = 0.3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking keys.

    Blocking by a cluster/bucket column keeps this linear; for unblocked
    corpora use LSH bucketing (see operators.ann) to generate blocks first.
    """
    t = df.select(
        F.col(id_col).alias("id"), F.col(block_col).alias("blk"), F.col(vec_col).alias("v")
    ).withColumn("nrm", l2_norm("v"))
    a = t.select(
        F.col("id").alias("id_a"), F.col("blk").alias("blk_a"),
        F.col("v").alias("v_a"), F.col("nrm").alias("nrm_a"),
    )
    b = t.select(
        F.col("id").alias("id_b"), F.col("blk").alias("blk_b"),
        F.col("v").alias("v_b"), F.col("nrm").alias("nrm_b"),
    )
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos", cosine_sim("v_a", "v_b", "nrm_a", "nrm_b"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.col("blk_a").alias("block"), "cos")
    )
