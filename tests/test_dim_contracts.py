"""Embedding-width fold contracts (VERDICT r7 item #1): every float
contract was originally calibrated at dim=64 — these tests pin them at
the real model widths (768, 1536) too.

Contracts:
1. The JVM HOF cosine fold (zip_with/aggregate), a Python left-to-right
   float loop, and DuckDB's list_sum/list_dot_product fold are
   BIT-IDENTICAL at every width (all three are sequential; DuckDB's
   fold verified sequential at up to 3072 dims).
2. The md5 fake embedder and its DuckDB replay (_duck_embed_raw +
   list_sum normalization) are bit-identical at every width.
3. numpy's pairwise 8-way-unrolled reduction is NOT the sequential fold
   above 8 elements — the divergence stays ulp-level (≤ 5e-15 relative)
   at all widths, which is why numpy values may only reach outputs via
   sign / argmin / FLOOR-quantized channels (operators/ann.py rule).
"""

import hashlib
import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

DIMS = [64, 768, 1536]


def _fake_raw(text: str, dim: int) -> list[float]:
    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{text}#{d}".encode()).digest()
        vals.append(int.from_bytes(h[:8], "big") / 2**63 - 1.0)
    return vals


def _py_cos(a, b) -> float:
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
        na = na + x * x
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


@pytest.mark.parametrize("dim", DIMS)
def test_jvm_python_duckdb_cosine_bit_identical(spark, dim):
    vecs = [(_fake_raw(f"a{i}", dim), _fake_raw(f"b{i}", dim)) for i in range(5)]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(vecs)],
        "i long, a array<double>, b array<double>",
    )
    from vector_search_spark.functions.vector import cosine_sim

    jvm = {
        r["i"]: r["c"]
        for r in df.select("i", cosine_sim("a", "b").alias("c")).collect()
    }
    # NB: arrays enter DuckDB via the md5 replay, NOT as float literals —
    # DuckDB parses bare float literals inside a LIST as DECIMAL(18,17)
    # and the decimal→double conversion drifts 1 ulp on ~25% of values
    # (scalar CAST('…' AS DOUBLE) is exact; measured). Production oracles
    # only ever read arrays from parquet or the md5 replay; the one
    # literal-list channel (LSH planes) is sign-tolerant by design.
    def _raw(txt: str) -> str:
        return (
            f"list_transform(generate_series(0, {dim - 1}), _ed -> "
            f"('0x' || substr(md5('{txt}' || '#' || _ed), 1, 16))"
            f"::UINT64::DOUBLE / 9223372036854775808.0 - 1.0)"
        )

    for i, (a, b) in enumerate(vecs):
        py = _py_cos(a, b)
        assert jvm[i] == py, f"dim={dim} row {i}: JVM fold != python fold"
        (duck,) = duckdb.sql(
            f"WITH v AS (SELECT {_raw(f'a{i}')} AS av, {_raw(f'b{i}')} AS bv)"
            f" SELECT list_sum(list_transform(generate_series(1, {dim}),"
            f" k -> av[k] * bv[k]))"
            f" / (sqrt(list_sum(list_transform(av, x -> x*x)))"
            f" * sqrt(list_sum(list_transform(bv, y -> y*y)))) FROM v"
        ).fetchone()
        assert duck == py, f"dim={dim} row {i}: DuckDB fold != python fold"


@pytest.mark.parametrize("dim", DIMS)
def test_fake_embedder_duckdb_replay_bit_identical(dim):
    from vector_search_spark.llm.clients import FakeEmbeddingClient

    txt = "round eight width sweep"
    py = FakeEmbeddingClient(dim)._embed_one(txt)
    rows = duckdb.sql(
        f"""
        WITH r AS (SELECT list_transform(generate_series(0, {dim - 1}), _ed ->
          ('0x' || substr(md5('{txt}' || '#' || _ed), 1, 16))::UINT64::DOUBLE
          / 9223372036854775808.0 - 1.0) AS rv),
        n AS (SELECT rv, sqrt(list_sum(list_transform(rv, x -> x*x))) AS nm FROM r)
        SELECT unnest(list_transform(rv, v -> v / nm)) FROM n
        """
    ).fetchall()
    duck = [r[0] for r in rows]
    assert duck == py, f"dim={dim}: embedder replay diverged"


@pytest.mark.parametrize("dim", DIMS)
def test_numpy_fold_ulp_bound_and_safe_channels(dim):
    rng = np.random.default_rng(42 + dim)
    X = rng.standard_normal((50, dim))
    for row in X:
        seq = 0.0
        for x in row:
            seq = seq + x * x
        np_sum = float(np.sum(row * row))
        rel = abs(np_sum - seq) / seq
        # measured worst-case: 4.4e-16 @64, 2.0e-15 @768, 5.5e-15 @1536
        assert rel <= 2e-14, f"dim={dim}: numpy fold off by {rel}"
    # argmin channel: ulp noise cannot flip a non-degenerate argmin
    probe = X[0]
    d_seq = []
    for row in X:
        acc = 0.0
        for x, p in zip(row, probe):
            acc = acc + (x - p) * (x - p)
        d_seq.append(acc)
    d_np = ((X - probe[None, :]) ** 2).sum(axis=1)
    assert int(np.argmin(d_np)) == d_seq.index(min(d_seq))
