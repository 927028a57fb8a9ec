"""Engine-wide configuration constants.

``EMB_DIM`` is the embedding dimensionality the registry is built at.
Registration happens at module import (oracle SQL strings embed
dim-derived literals — LSH plane vectors, PQ subspace widths), so the
dimension is a PROCESS-level constant, not a per-query parameter: set
``SPARK_GRAFT_EMB_DIM`` before importing to re-register the whole
registry — Spark queries AND DuckDB oracles consistently — at another
width. The driver's gate runs without the variable (dim=64, the fixture
width); ``SPARK_GRAFT_EMB_DIM=768 tools/parity.py <d768-fixture>`` is
the real-embedding-width validation sweep (VERDICT r7 item #1).

Bit-exactness across widths is measured, not assumed: DuckDB's
``list_sum``/``list_dot_product`` folds are sequential (bit-identical to
a Python left-to-right fold and the JVM ``aggregate`` HOF) at 64, 768,
1536 and 3072 dims — see tests/test_vector.py.
"""

from __future__ import annotations

import os

EMB_DIM = int(os.environ.get("SPARK_GRAFT_EMB_DIM", "64"))
