"""Multimodal column conventions: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas functions.

The decode step itself (PIL/librosa/ffmpeg) is STUBBED — those libraries are
not in this container — behind ``decode_image_meta``'s deterministic fake.
Everything Spark-side is real and tested: the schema convention, the
``mapInPandas`` batch shape, and the partitioning story (binary payloads
never shuffle through an aggregate; metadata extraction is a map-only stage
that runs at scan parallelism on a 1000-executor cluster).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Convention: a multimodal asset is a struct-adjacent set of columns.
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("content_md5", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
])


def as_binary_asset(df: DataFrame, id_col: str, payload: Column,
                    media_type: str) -> DataFrame:
    """Wrap any source column as the binary-asset convention."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        payload.cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derives (width, height,
    channels) from the content hash. Replace with PIL/IO in a real cluster
    image — the surrounding plumbing (batching, schema, partitioning) is
    unchanged. A real decoder failure maps to NULL dims, as here for empty
    payloads."""
    if not payload:
        return (0, 0, 0)
    d = hashlib.md5(payload).digest()
    return (64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 4)


def extract_media_meta(assets: DataFrame) -> DataFrame:
    """Map-only metadata extraction over binary payloads via mapInPandas.

    Arrow-batched: each batch arrives as a pandas DataFrame; the decode loop
    is per-row Python (unavoidable for codec work) but amortized across the
    batch, and the stage carries no shuffle — it scales linearly with input
    splits.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "byte_len": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "content_md5": [hashlib.md5(p).hexdigest() if p else None
                                for p in pdf["payload"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_channels": [d[2] for d in dims],
            })

    return assets.mapInPandas(decode_batches, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: emits (asset_id, frame_index) work units
    without decoding. The decoder itself is the stubbed step.

    Raises NotImplementedError from the decode UDF if ever executed against
    a real codec path — the plan shape (explode of a frame-index sequence,
    then mapInPandas per frame) is the scalable part being exercised.
    """
    n_frames = (F.col("byte_len") / F.lit(1024)).cast("int") + 1  # fake probe
    return (
        extract_media_meta(assets)
        .withColumn("frame_index",
                    F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))))
        .select("asset_id", "frame_index")
    )
