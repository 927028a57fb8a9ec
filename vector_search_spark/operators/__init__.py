from .asof import asof_join, range_join_binned, salted_group_sum
from .dedup import (
    embedding_neardup_pairs,
    exact_dup_stats,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_groups,
    tokenset_fingerprint,
)
from .knn import knn, multiprobe_fusion, threshold_search, topk_per_key
from .sweepline import sweep_overlap, sweep_overlap_dates

__all__ = [
    "asof_join",
    "embedding_neardup_pairs",
    "exact_dup_stats",
    "jaccard_pairs",
    "knn",
    "minhash_lsh_pairs",
    "multiprobe_fusion",
    "range_join_binned",
    "salted_group_sum",
    "simhash_groups",
    "sweep_overlap",
    "sweep_overlap_dates",
    "threshold_search",
    "tokenset_fingerprint",
    "topk_per_key",
]
