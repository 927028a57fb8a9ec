from .queries import QUERIES

__all__ = ["QUERIES"]
