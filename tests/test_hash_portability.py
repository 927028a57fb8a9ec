"""Three-way portability: the portable polynomial hash (and the MinHash
permutation family on top of it) must be bit-identical across the Spark
expression, the DuckDB oracle SQL, and a pure-Python reference — that
equivalence is what makes the dedup family oracle-checkable at all.

Randomized over printable-ASCII strings with adversarial edge cases
(empty, single char, spaces, very long) under a fixed seed.
"""

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from vector_search_spark.functions.text import (
    HASH_MIX,
    HASH_MOD,
    minhash_perm,
    poly_hash,
)

ALPHABET = string.ascii_letters + string.digits + " .,;:-_!?/#@"


def py_poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return ((h + 13) * HASH_MIX) % HASH_MOD


def _duck_poly_sql(col: str) -> str:
    return (
        f"((list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, length({col})), "
        f"i -> CAST(ascii(substr({col}, i, 1)) AS BIGINT))), "
        f"(a, c) -> (a * 31 + c) % 1000000007) + 13) "
        f"* 2654435761) % 1000000007"
    )


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(42)
    strs = ["", "a", " ", "  ", "aa bb", ALPHABET, "x" * 500]
    for _ in range(500):
        n = rng.randint(1, 80)
        strs.append("".join(rng.choice(ALPHABET) for _ in range(n)))
    return strs


def test_poly_hash_three_way(spark, corpus):
    want = [py_poly(s) for s in corpus]

    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "i int, s string")
    got_spark = [
        r.h for r in df.select("i", poly_hash("s").alias("h")).orderBy("i").collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(corpus)))
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {_duck_poly_sql('s')} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got_duck == want


def test_minhash_perm_three_way(spark, corpus):
    import numpy as np

    base = [py_poly(s) for s in corpus if s]
    a = [((2 * s + 1) * HASH_MIX) % HASH_MOD for s in range(4)]
    b = [s * 40503 + 7 for s in range(4)]
    want = [[(h * a[s] + b[s]) % HASH_MOD for s in range(4)] for h in base]

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(base)], "i int, h long"
    )
    got_spark = [
        list(r.p)
        for r in df.select(
            "i",
            F.array(
                *[minhash_perm(F.col("h"), F.lit(s)) for s in range(4)]
            ).alias("p"),
        )
        .orderBy("i")
        .collect()
    ]
    assert got_spark == want

    arr = np.asarray(base, dtype=np.int64)
    A = np.asarray(a, dtype=np.int64)
    B = np.asarray(b, dtype=np.int64)
    got_np = ((arr[:, None] * A[None, :] + B[None, :]) % HASH_MOD).tolist()
    assert got_np == want
