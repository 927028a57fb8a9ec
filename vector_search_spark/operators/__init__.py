from .knn import knn, multiprobe_fusion, threshold_search, topk_per_key

__all__ = ["knn", "multiprobe_fusion", "threshold_search", "topk_per_key"]
