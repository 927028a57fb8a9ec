"""Distributed batch embedding via mapInPandas (V6 done right).

The reference embeds one row per HTTPS call (camp_vec_save.py:49-56,
nl_targeting_save.py:131-132). Here the embedding client is invoked once per
Arrow batch inside ``mapInPandas`` — at 1000 executors that is thousands of
concurrent batched calls, not millions of sequential singletons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

from .clients import EmbeddingClient, FakeEmbeddingClient


def embed_texts(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    client: EmbeddingClient | None = None,
    dim: int | None = None,
) -> DataFrame:
    from ..utils import fan_out

    client = client or FakeEmbeddingClient(dim)  # dim=None -> config.EMB_DIM
    df = fan_out(df)
    # NB: build a fresh field list — StructType(df.schema.fields).add(...)
    # would append to the DataFrame's own cached schema object.
    out_schema = StructType(
        [*df.schema.fields, StructField(out_col, ArrayType(FloatType()))]
    )

    def fn(batches):
        for pdf in batches:
            vecs = client.embed_batch(pdf[text_col].astype(str).tolist())
            pdf = pdf.copy()
            pdf[out_col] = vecs
            yield pdf

    return df.mapInPandas(fn, out_schema)
