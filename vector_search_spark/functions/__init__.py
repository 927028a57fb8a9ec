from .vector import (
    cosine_sim,
    cosine_sim_pd,
    dot,
    l2_norm,
    l2_normalize,
    vec_from_text,
    vec_to_text,
)

__all__ = [
    "cosine_sim",
    "cosine_sim_pd",
    "dot",
    "l2_norm",
    "l2_normalize",
    "vec_from_text",
    "vec_to_text",
]
