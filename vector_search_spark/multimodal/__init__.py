from .binary_ops import extract_features, frame_sample, make_media_table

__all__ = ["extract_features", "frame_sample", "make_media_table"]
