"""Vector expression library.

Re-expresses the reference's MariaDB vector surface
(``VEC_FromText`` / ``1 - VEC_DISTANCE_COSINE`` — nl_targeting.py:56,
camp_vec_save.py:66-68, camp_vec_rcmn.py:44) as Catalyst expressions.

Design notes for scale:

- The primary implementation is a higher-order-function fold (``zip_with`` +
  ``aggregate``) that runs JVM-side inside whole-stage codegen — no Python
  boundary, no Arrow transfer, vectorized parquet reads feed it directly.
- All arithmetic is performed in DOUBLE after casting each float32 element,
  with a strict left-to-right fold seeded at 0.0. This makes the result
  bit-identical to the DuckDB oracle's ``list_cosine_similarity`` over
  ``DOUBLE[]`` (verified empirically), so top-k membership never flips on
  float noise.
- A Pandas-UDF variant (`cosine_sim_pd`) exists for cross-checking and for
  workloads where Arrow-batched NumPy beats codegen (very high dims).
- For repeated scans, precompute ``l2_norm`` once per corpus row
  (``with_norm``) instead of re-deriving it per probe.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def vec_from_text(col: ColumnOrName) -> Column:
    """Parse ``'[0.1, 0.2, ...]'`` text into array<float>.

    Equivalent of MariaDB ``VEC_FromText`` (camp_vec_save.py:68).
    """
    return F.from_json(_c(col), "array<float>")


def vec_to_text(col: ColumnOrName) -> Column:
    """Inverse of :func:`vec_from_text` (vector → JSON text literal)."""
    return F.to_json(_c(col))


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Sequential left-to-right double-precision dot product (JVM codegen)."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot(a, a))


def euclidean_dist(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Euclidean distance (DuckDB ``list_distance`` twin) — the metric for
    inner-product-free workloads; on L2-normalized vectors its ordering is
    the cosine ordering (dist² = 2 - 2·cos)."""
    diff = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(a: ColumnOrName) -> Column:
    """Scale to unit L2 norm (cosine on unit sphere == monotone in euclidean,
    which is what lets BucketedRandomProjectionLSH stand in for cosine ANN)."""
    a = _c(a)
    n = l2_norm(a)
    return F.transform(a, lambda x: (x.cast("double") / n).cast("float"))


def cosine_sim(
    a: ColumnOrName,
    b: ColumnOrName,
    norm_a: ColumnOrName | None = None,
    norm_b: ColumnOrName | None = None,
) -> Column:
    """``1 - VEC_DISTANCE_COSINE(a, b)`` (nl_targeting.py:56, camp_vec_rcmn.py:44).

    Pass precomputed ``norm_a``/``norm_b`` columns to avoid refolding norms
    on every probe×corpus pair — at 100 TB the corpus norm is computed once,
    not once per probe.
    """
    na = _c(norm_a) if norm_a is not None else l2_norm(a)
    nb = _c(norm_b) if norm_b is not None else l2_norm(b)
    return dot(a, b) / (na * nb)


_COSINE_PD = None


def cosine_sim_pd(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Arrow-batched NumPy cosine — cross-check / high-dim alternative.

    Built lazily because ``pandas_udf`` return-type parsing needs an active
    SparkSession.
    """
    global _COSINE_PD
    if _COSINE_PD is None:

        @pandas_udf("double")
        def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
            import numpy as np

            av = np.stack(a.to_numpy()).astype(np.float64)
            bv = np.stack(b.to_numpy()).astype(np.float64)
            num = (av * bv).sum(axis=1)
            den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
            return pd.Series(num / den)

        _COSINE_PD = _cos
    return _COSINE_PD(_c(a), _c(b))
