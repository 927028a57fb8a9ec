"""Rotating driver-gate replica in CI (VERDICT r6 item #6).

125 of the 175+ registry rows are certified only by full builder/judge
parity sweeps, not by pytest. This test runs the EXACT gate replica
(tools/parity.py's compare — same canonicalization, same array-column
rejection, same DuckDB oracle) on a deterministic 15-row slice that
rotates with the calendar date, so every registered row passes through
the in-tests gate every ~12 daily runs — a registry row whose oracle or
query drifts can hide from CI for at most one rotation period.

The slice is date-seeded, NOT random: two runs on the same day test the
same rows (reproducible failures), and consecutive days advance the
window so the whole registry cycles. Runs at sf0.001 to stay inside the
suite's latency budget (~60-90 s for 15 rows).
"""

import datetime
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "tools"))

SLICE = 15


def rotation_slice(names: list[str], day: datetime.date) -> list[str]:
    """Deterministic 15-row window for ``day``: sorted registry, window
    index = day ordinal mod the number of windows → full coverage over
    one rotation period of consecutive days."""
    names = sorted(names)
    n_windows = (len(names) + SLICE - 1) // SLICE
    w = day.toordinal() % n_windows
    return names[w * SLICE : (w + 1) * SLICE]


def test_rotation_covers_whole_registry():
    from vector_search_spark.plans.queries import QUERIES

    names = sorted(QUERIES)
    n_windows = (len(names) + SLICE - 1) // SLICE
    base = datetime.date(2026, 1, 1)
    seen: set = set()
    for d in range(n_windows):
        seen.update(rotation_slice(names, base + datetime.timedelta(days=d)))
    assert seen == set(names)


def test_parity_gate_rotating_slice(spark, sf_dir):
    from parity import compare, duck_connect

    from vector_search_spark.plans.queries import QUERIES

    today = datetime.date.today()
    rows = rotation_slice(list(QUERIES), today)
    assert rows
    con = duck_connect(sf_dir)
    failures = []
    for name in rows:
        spec = QUERIES[name]
        if spec.oracle is None:
            if spec.fn(spark, sf_dir).count() < 0:  # pragma: no cover
                failures.append((name, "rows-only count failed"))
            continue
        try:
            ok, status = compare(name, spec.fn(spark, sf_dir), con)
        except Exception as e:  # noqa: BLE001
            ok, status = False, f"EXCEPTION: {e}"
        if not ok:
            failures.append((name, status))
    assert not failures, failures


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
