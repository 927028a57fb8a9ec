"""Skewed-fixture stage-balance sweep (VERDICT r7 item #4).

Runs named registry rows against a zipf-skewed fixture
(tools/make_scaled_fixtures.py … zipf: one user owns ~10% of events, one
source ~20% of docs, one label ~20% of vectors) on an AQE-skew-enabled,
UI-enabled session, and reports per row:

- wall seconds,
- the heaviest completed stage's task-duration [min, p50, max] and the
  max/p50 imbalance ratio (the skew signal: a well-split row stays
  near 1-3x even with a 10%-hot key; a row serialized on the hot key
  shows max >> p50),
- whether AQE's skew-join split fired anywhere in the run
  (spark.sql.adaptive.skewJoin at the probe thresholds).

Usage: python tools/skew_sweep.py <fixture_dir> <row> [row ...]
One JSON line per row; evidence recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from probe_lib import (  # noqa: E402
    UI_PORT,
    completed_stage_count,
    heaviest_stage_task_quantiles,
    timed,
    ui_skew_session,
)


def main() -> None:
    fixture = sys.argv[1]
    rows = sys.argv[2:]
    spark = ui_skew_session("skew_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    from vector_search_spark.plans.queries import QUERIES

    for name in rows:
        floor = completed_stage_count(UI_PORT)
        fn = QUERIES[name].fn
        wall = timed(lambda: fn(spark, fixture).collect())
        stage_id, q = heaviest_stage_task_quantiles(UI_PORT, floor)
        imbalance = round(q[2] / max(q[1], 0.01), 1)
        print(
            json.dumps(
                {
                    "op": name,
                    "wall_s": wall,
                    "heaviest_stage": stage_id,
                    "task_s_min_p50_max": q,
                    "max_over_p50": imbalance,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
