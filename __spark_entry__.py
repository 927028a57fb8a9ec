"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` / ``oracle_sql()`` — named operator registry with DuckDB
oracles, implemented in ``vector_search_spark.plans.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import vector_search_spark.plans.queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-probe KNN fusion over embeddings joined to documents
    (the reference's camp_vec_rcmn recommendation pipeline, SURVEY §3.2,
    re-expressed as one distributed plan)."""
    sf_dir = "/root/testdata/sf0.001"
    return _q.v_knn_join_docs(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
