"""Incremental similarity-score fusion (SURVEY §7.6: A6 as a streaming
aggregation).

The batch A6 operator (camp_vec_rcmn.py:52-62 semantics) sums per-probe
similarity scores per corpus id. Streamed, the corpus arrives as a bounded
or unbounded vector stream; each micro-batch is scored against the
broadcast probe set with the SAME cosine expression the batch path uses,
and the per-id fused score accumulates in streaming state (update mode).
Per-probe top-k is not streaming-expressible (rank over an unbounded
stream); the streaming surface is threshold-filtered fusion — the batch
twin of which is oracle-checkable, see ``fused_scores_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.knn import score_probes


def fused_scores(
    vectors: DataFrame,
    probes: DataFrame,
    threshold: float = 0.0,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    probe_vec: str = "probe_vec",
) -> DataFrame:
    """Score every arriving vector against all probes, keep scores above
    ``threshold``, and maintain the running fused (summed) score per id.
    Works identically on a batch DataFrame or a streaming one (the groupBy
    becomes stateful streaming aggregation in update mode)."""
    scored = score_probes(vectors, probes, corpus_vec, probe_vec, "score")
    return (
        scored.filter(F.col("score") >= threshold)
        .groupBy(corpus_id)
        .agg(
            F.count("*").alias("n_hits"),
            F.sum("score").alias("fused_score"),
        )
    )


def run_fused_scores_availablenow(
    spark, stream: DataFrame, probes: DataFrame, table_name: str, threshold: float = 0.0
) -> DataFrame:
    """Drain a bounded vector stream through the fusion agg (update mode),
    returning the final per-id state (max n_hits emission wins — the
    running totals are monotone)."""
    q = (
        fused_scores(stream, probes, threshold)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(table_name)
    return emitted.groupBy("vec_id").agg(
        F.max("n_hits").alias("n_hits"),
        F.max_by("fused_score", "n_hits").alias("fused_score"),
    )
