"""Sequence packing — the canonical LLM-pretraining data operator: stream
documents (ordered by id) into FIXED-length training sequences, splitting
documents across sequence boundaries (GPT-style packing), and emit the
(sequence, document) span map the data loader needs.

The core primitive is a GLOBAL exclusive prefix sum. The naive form —
``SUM(tok) OVER (ORDER BY doc_id)`` with no partition key — collapses to a
SINGLE task in Spark (an un-partitioned window sorts everything on one
executor): the textbook scale-killer for a 100 TB corpus. This module
implements the classic two-level distributed rewrite instead:

1. block partial sums: ``groupBy(doc_id div B)`` → one row per block
   (corpus/B rows — a map-side-combined aggregation, fully parallel);
2. block offsets: exclusive cumsum over the TINY block relation (the only
   un-partitioned window, over corpus/B rows — for B=4096, a 1e9-doc
   corpus yields ~244k block rows: driver-trivial);
3. within-block exclusive cumsum: a window PARTITIONED by block (parallel),
   plus the broadcast block offset.

``cum_before`` is exact BIGINT and identical to the single-window form, so
a plain-SQL oracle can certify the distributed rewrite lossless — the same
certification pattern as the z-order superset rewrite.

Reference counterpart: SURVEY §2 north-star training-data ops (sequence
packing is the step between shard packing (a_shard_packing) and the
batch loader).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_exclusive_cumsum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "cum_before",
    block: int = 4096,
) -> DataFrame:
    """Exclusive global running total of ``val_col`` in ``order_col``
    order, WITHOUT an un-partitioned window over the full data: two-level
    (block partials → tiny offset cumsum → within-block window). Requires
    a non-negative integer ``order_col`` whose values are UNIQUE (the
    within-block window orders by ``order_col`` alone, so duplicate keys
    would make the exclusive sum nondeterministic among the duplicates);
    block = order div block_size preserves order across blocks. Adds
    ``out_col`` (BIGINT)."""
    if block < 1:
        raise ValueError(f"block must be >= 1, got {block}")
    clash = {"_blk", "_boff"} & set(df.columns)
    if clash:
        raise ValueError(
            f"global_exclusive_cumsum uses temp columns {sorted(clash)}; "
            "rename them on the input first"
        )
    # Exact integer division — `/` would route through double and can
    # misassign blocks for order_col values at or above 2^53.
    blk = F.expr(f"cast(`{order_col}` as bigint) div {block}")
    d = df.withColumn("_blk", blk)
    part = d.groupBy("_blk").agg(F.sum(val_col).cast("long").alias("_bsum"))
    woff = (
        Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = part.select(
        "_blk", F.coalesce(F.sum("_bsum").over(woff), F.lit(0)).alias("_boff")
    )
    win = (
        Window.partitionBy("_blk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offs), "_blk")
        .withColumn(
            out_col,
            (
                F.col("_boff")
                + F.coalesce(F.sum(val_col).over(win), F.lit(0))
            ).cast("long"),
        )
        .drop("_blk", "_boff")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    ctx: int = 512,
    block: int = 4096,
) -> DataFrame:
    """Pack documents into fixed ``ctx``-token sequences in ``id_col``
    order (``id_col`` values must be unique non-negative integers — see
    ``global_exclusive_cumsum``), splitting documents at sequence
    boundaries. Output one row per
    (sequence, document) span: ``seq_id``, ``id_col``, ``doc_tok_start``
    (offset of the span inside the document), ``n_toks`` (tokens of this
    doc in this sequence), ``is_split`` (1 if the doc crosses a
    boundary) — all BIGINT. Every sequence except the last sums to
    exactly ``ctx`` tokens (invariant pinned in tests).

    Work per doc is O(1 + spanned sequences); the explode is bounded by
    tok/ctx + 1, so total output is O(total_tokens / ctx + n_docs) —
    corpus-linear, no global sort (see ``global_exclusive_cumsum``).

    tok < 1 rows are excluded BEFORE the prefix sum (they span no
    sequence; a negative count entering ``cum_before`` would corrupt
    every later doc's position, and ``F.sequence(first, last)`` with
    last < first generates a DESCENDING range rather than an empty
    one)."""
    if ctx < 1:
        raise ValueError(f"ctx must be >= 1, got {ctx}")
    c = global_exclusive_cumsum(
        docs.select(id_col, tok_col).filter(F.col(tok_col) >= 1),
        id_col,
        tok_col,
        "cum_before",
        block,
    )
    first = F.expr(f"cum_before div {ctx}")
    last = F.expr(f"(cum_before + {tok_col} - 1) div {ctx}")
    e = c.select(
        id_col,
        tok_col,
        "cum_before",
        F.explode(F.sequence(first, last)).alias("seq_id"),
        (first != last).cast("long").alias("is_split"),
    )
    lo = F.greatest(F.col("seq_id") * ctx, F.col("cum_before"))
    hi = F.least(
        (F.col("seq_id") + 1) * ctx, F.col("cum_before") + F.col(tok_col)
    )
    return e.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        id_col,
        (lo - F.col("cum_before")).cast("long").alias("doc_tok_start"),
        (hi - lo).cast("long").alias("n_toks"),
        "is_split",
    )
