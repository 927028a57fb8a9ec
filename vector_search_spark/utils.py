"""Execution-shape helpers shared across operator families."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ensure a DataFrame entering an Arrow/Python (``mapInPandas``) stage
    has at least ``defaultParallelism`` partitions.

    A small scan — one parquet file at test scale — arrives as a single
    partition, which serializes the whole Python stage through one worker
    (measured 4× on the sf0.1 shingle stage). At cluster scale inputs
    already exceed the core count and this is a no-op; the partition count
    comes from plan metadata, no job runs. The round-robin shuffle moves
    only the rows feeding the Python stage, and every consumer downstream
    of our Arrow stages is order-insensitive (sets, joins, aggregates), so
    the reshuffle is semantics-free.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def pid_scratch(name: str, sf_dir: str, root: str | None = None) -> str:
    """Repo-relative scratch path for a persisted index, keyed by process
    id (concurrent pytest/parity/bench runs can't overwrite each other's
    index mid-read) and fixture scale. Prunes sibling directories left by
    DEAD processes for the same index name on the way in, so repeated
    runs don't grow the scratch area unboundedly."""
    import os
    import shutil

    repo_root = root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    scratch = os.path.join(repo_root, ".scratch")
    prefix = f"{name}_"
    if os.path.isdir(scratch):
        for d in os.listdir(scratch):
            if not d.startswith(prefix):
                continue
            pid_s = d.rsplit("_", 1)[-1]
            if not pid_s.isdigit() or int(pid_s) == os.getpid():
                continue
            try:
                os.kill(int(pid_s), 0)  # raises if the owner is gone
            except ProcessLookupError:
                shutil.rmtree(os.path.join(scratch, d), ignore_errors=True)
            except PermissionError:
                pass  # live pid under another user: leave it
    return os.path.join(
        scratch,
        f"{name}_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
