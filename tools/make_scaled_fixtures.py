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

Usage: python tools/make_scaled_fixtures.py [n] [base_sf_dir] [out_dir] [zipf]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.scratch/sfx10

``zipf`` (round 8, VERDICT r7 item #4) additionally skews the hot keys a
real 100 TB corpus has and the near-uniform fixtures lack — applied
AFTER replication so the skew spans copies (deterministic xxhash64
routing, so both engines see identical data):

- events: ~10% of all events are re-routed to ONE hot user_id
  (sessionize/asof/window rows get a giant per-key partition);
- documents: ~20% of all docs re-routed to ONE hot source (the
  (source, lang) blocked-quadratic rows get a dominant block);
- embeddings: ~20% of vectors re-routed to ONE hot label (label-blocked
  near-dup pairs get a dominant block).
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


HOT_USER = 77
HOT_SOURCE = "hot_source"
HOT_LABEL = 0


def zipf_skew(df: DataFrame, table: str) -> DataFrame:
    """Route a deterministic slice of rows to one hot key (see module
    docstring). xxhash64 of the PRIMARY key decides membership, so the
    routing is engine-independent data, not query-time behavior."""
    if table == "events":
        return df.withColumn(
            "user_id",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(1000)) < 100,
                F.lit(HOT_USER).cast(df.schema["user_id"].dataType),
            ).otherwise(F.col("user_id")),
        )
    if table == "documents":
        return df.withColumn(
            "source",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(1000)) < 200,
                F.lit(HOT_SOURCE),
            ).otherwise(F.col("source")),
        )
    if table == "embeddings":
        return df.withColumn(
            "label",
            F.when(
                F.pmod(F.xxhash64("vec_id"), F.lit(1000)) < 200,
                F.lit(HOT_LABEL).cast(df.schema["label"].dataType),
            ).otherwise(F.col("label")),
        )
    return df


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, ".scratch", f"sfx{n}")
    )
    zipf = len(sys.argv) > 4 and sys.argv[4] == "zipf"
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
        if zipf:
            df = zipf_skew(df, t)
        # single FILE per table (coalesce + move), matching the driver's
        # fixture layout: DuckDB's '<t>.parquet' view and the streaming
        # rows' 'events*.parquet' glob both expect files, not Spark dirs.
        # ROW-GROUP size is bounded to 2 MB (VERDICT r9 next #6): parquet
        # is splittable only at row-group granularity, and the default
        # 128 MB block made the 100x documents table ONE row group —
        # every scan-side stage serialized onto one task no matter the
        # plan (measured 10.5 s vs 2.15 s on a multi-unit copy). Bounded
        # groups keep one-file layout AND ~file_size/8MB-way scan
        # parallelism, so probes measure operators, not layout.
        stage = f"{out}/_stage_{t}"
        df.coalesce(1).write.mode("overwrite").option(
            "parquet.block.size", 2 * 1024 * 1024
        ).parquet(stage)
        (part,) = glob.glob(f"{stage}/part-*.parquet")
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        shutil.move(part, dst)
        shutil.rmtree(stage, ignore_errors=True)
        from vector_search_spark.utils import parquet_scan_units

        _, rgs = parquet_scan_units(dst)
        print(
            f"{t}: {spark.read.parquet(dst).count()} rows, "
            f"{rgs} row groups (max scan parallelism)"
        )
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
