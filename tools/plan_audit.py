"""Physical-plan audit over the registered queries.

Prints, per query: join strategies, whether every parquet scan prunes its
ReadSchema (reads fewer columns than the table has, when the query allows),
pushed filters, and whole-stage-codegen presence. Run after changing any
operator — a scan that stops pruning or a broadcast that degrades to a
sort-merge join shows up here before it shows up in the bench.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def audit(plan: str) -> dict:
    # AdaptiveSparkPlan.toString() prints BOTH "== Final Plan ==" and
    # "== Initial Plan ==" sections; counting both doubles every scan and
    # join. Audit only the final (actually executed) plan.
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "joins": re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)",
            plan,
        ),
        "pushed": [
            p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p
        ],
        "schemas": re.findall(r"ReadSchema: struct<([^\n]*)", plan),
        # whole-stage codegen shows as "WholeStageCodegen" in executed plans
        # and as "*(n)" operator prefixes in AQE's initial plan string
        "codegen": bool(re.search(r"WholeStageCodegen|\*\(\d+\)", plan)),
        "exchanges": len(re.findall(r"Exchange ", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from vector_search_spark.plans.queries import QUERIES
    from vector_search_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            # execute so AQE finalizes: broadcast conversions, coalescing,
            # and whole-stage codegen markers only appear in the final plan
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming-drain queries execute eagerly
            print(f"{name}: SKIP ({type(e).__name__})")
            continue
        a = audit(plan)
        cart = [j for j in a["joins"] if j in ("CartesianProduct",)]
        flag = " !!CARTESIAN" if cart else ""
        print(
            f"{name}: joins={a['joins']} exchanges={a['exchanges']} "
            f"codegen={a['codegen']} pushed={len(a['pushed'])} "
            f"scans={len(a['schemas'])}{flag}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
