"""Multimodal (image/audio/video) column plumbing — north-star surface.

Media are opaque ``binary`` payloads with typed metadata; decode /
feature-extract / frame-sample run as Arrow-batched ``mapInPandas`` stages.
The actual codecs are NOT in this container, so decoding is stubbed behind
``decoder='fake'`` (deterministic md5-based features) or raises
``NotImplementedError`` for real codecs — the Spark-side plumbing (schema,
binary Arrow transfer, batch shapes, partitioning) is real and tested; the
fake path is oracle-checked against DuckDB byte functions, proving the
binary round-trip is exact.

At scale: payloads stay columnar (parquet binary), feature extraction is an
embarrassingly parallel map with no shuffle; frame sampling explodes to
(media_id, frame_no) rows that downstream ops treat like any other table.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.catalog import load_table

MEDIA_KINDS = ["image", "audio", "video"]


def make_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes of the
    text (a deterministic opaque blob), kind cycles by id, metadata derived
    from n_chars. Schema mirrors a real media lake table."""
    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            (F.col("n_chars") / 100.0).alias("duration_s"),
            F.lit("raw").alias("fmt"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("head_byte", IntegerType()),
    ]
)


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract each payload (Arrow-batched).

    ``decoder='fake'``: deterministic features (length, md5 digest, first
    byte) — exercises the full binary path without codecs.
    Any other decoder raises NotImplementedError (no image/audio libs in
    this container); plug a real one in by matching this signature.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r} requires codec libraries not present here; "
            "only the deterministic 'fake' decoder is available"
        )
    from ..utils import fan_out

    df = fan_out(df)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in payloads],
                    "digest": [hashlib.md5(bytes(b)).hexdigest() for b in payloads],
                    "head_byte": [bytes(b)[0] if len(b) else -1 for b in payloads],
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, width: int = 32, height: int = 24, decoder: str = "fake"
) -> DataFrame:
    """Resize each image payload to width×height (Arrow-batched).

    ``decoder='fake'``: deterministic resample — the payload bytes repeated
    cyclically and truncated to width*height (so output CONTENT, not just
    shape, is oracle-checkable: DuckDB reproduces it with repeat+substr).
    A real decoder would pixel-resample; the batch shape, binary transfer,
    and schema contract are identical."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r} requires codec libraries not present here; "
            "only the deterministic 'fake' decoder is available"
        )
    from ..utils import fan_out

    images = fan_out(df.filter(F.col("kind") == "image"))
    target = width * height

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_bytes": [], "resized": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                resized = (b * (target // max(len(b), 1) + 1))[:target] if b else b"\x00" * target
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["n_bytes"].append(len(resized))
                out["resized"].append(resized)
            yield pd.DataFrame(out)

    return images.mapInPandas(fn, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample n byte-range 'frames' per video payload (the frame-sampling
    plumbing: explode → per-frame rows; a real decoder would seek instead
    of slicing bytes)."""
    from ..utils import fan_out

    videos = fan_out(df.filter(F.col("kind") == "video"))

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["frame_bytes"].append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    return videos.mapInPandas(fn, FRAME_SCHEMA)
