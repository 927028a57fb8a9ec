"""Materialize an N×-replicated copy of a fixture dir as REAL parquet, so
the FULL registry parity gate (tools/parity.py — Spark AND DuckDB read
the same files) can run at 10× sf0.1 ≈ sf1 (VERDICT r6 item #1: every
float hazard so far surfaced only at the next scale up — ROUND halves at
sf0.1, t_quality_score's exact 0.5146875 — so the strongest remaining
correctness probe is going UP again).

Replication semantics (same family as tools/scale_probe.py, made
FK-consistent across tables so relational rows stay meaningful):

- region/nation: copied verbatim (dimensions; fact copies share them).
- customer/supplier/part: primary keys shifted per copy.
- orders: o_orderkey AND o_custkey shifted identically to customer.
- lineitem: l_orderkey/l_partkey/l_suppkey shifted to match.
- events: event_id and user_id shifted (per-copy distinct users, same
  time range — per-day volumes scale, per-user series replicate).
- documents: doc_id shifted; copies >= 1 word-salted (``c{i}_`` prefix →
  zero cross-copy shingle overlap, dedup keeps its real output shape);
  n_chars recomputed (fixture invariant n_chars == length(text)).
- embeddings: vec_id shifted; copies >= 1 get one component
  deterministically perturbed (copy-indexed position, +0.003*i) so
  vector copies are near- but not exact-duplicates — exact clones would
  make every KNN top-k a tie ladder of identical scores, which is
  parity-safe but quality-gate-degenerate (recall floors).

Copy 0 is byte-identical to the base fixture for every table.

Usage: python tools/make_scaled_fixtures.py [n] [base_sf_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.scratch/sfx10
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

STRIDE = {
    "customer": 10_000_000,
    "supplier": 10_000_000,
    "part": 10_000_000,
    "orders": 10_000_000,
    "lineitem": 10_000_000,
    "events": 10_000_000,
    "documents": 1_000_000,
    "embeddings": 1_000_000,
}
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(df: DataFrame, table: str, n: int) -> DataFrame:
    stride = STRIDE[table]
    copies = []
    for i in range(n):
        c = df
        for col in SHIFT_COLS[table]:
            c = c.withColumn(col, F.col(col) + i * stride)
        if table == "documents" and i > 0:
            # source salted too: the blocked quadratic rows
            # (d_jaccard_pairs etc.) key on (source, lang) — identical
            # block keys across copies would make 10x data cost 100x
            # (both engines); per-copy sources keep block sizes at base
            # and the quadratic work linear, which is also the realistic
            # delivery shape (new batches ARE new sources)
            c = (
                c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"c{i}_$1")
                )
                .withColumn("n_chars", F.length("text").cast("long"))
                .withColumn("source", F.concat(F.lit(f"c{i}_"), "source"))
            )
        if table == "embeddings" and i > 0:
            # label shifted for the same reason: embedding near-dup rows
            # block on label
            pos = i % 64
            c = c.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: F.when(
                        j == pos, (x + F.lit(0.003 * i)).cast("float")
                    ).otherwise(x),
                ),
            ).withColumn("label", F.col("label") + F.lit(i * 1000))
        copies.append(c)
    return reduce(DataFrame.unionByName, copies)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, ".scratch", f"sfx{n}")
    )
    from vector_search_spark.session import get_spark
    from vector_search_spark.sources.catalog import load_table

    spark = get_spark("make_scaled_fixtures")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = load_table(spark, base, t)
        if t in STRIDE:
            df = replicate(df, t, n)
        # single FILE per table (coalesce + move), matching the driver's
        # fixture layout: DuckDB's '<t>.parquet' view and the streaming
        # rows' 'events*.parquet' glob both expect files, not Spark dirs
        stage = f"{out}/_stage_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        (part,) = glob.glob(f"{stage}/part-*.parquet")
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        shutil.move(part, dst)
        shutil.rmtree(stage, ignore_errors=True)
        print(f"{t}: {spark.read.parquet(dst).count()} rows")
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
