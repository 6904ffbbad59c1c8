"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, Arrow batching, mapInPandas signatures, partition
sizing) is real and tested, while the actual codec step is STUBBED — the
decode libraries (Pillow/ffmpeg/soundfile) are not in this container.  The
stub is deterministic so tests can assert the full pipeline shape.

``decode_and_featurize(..., codec="stub")`` is the supported path here;
``codec="real"`` raises NotImplementedError by design.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "FEATURE_SCHEMA", "attach_media_metadata",
           "decode_and_featurize"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType(), False),    # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("sha256", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
])

_FEAT_DIM = 8


def attach_media_metadata(df: DataFrame, payload_col: str = "payload",
                          kind: str = "image") -> DataFrame:
    """Wrap a raw binary column into the engine's media schema."""
    return df.withColumn("meta", F.struct(
        F.lit(kind).alias("kind"), F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate")))


def _stub_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decoded feature': bytes of sha256 scaled to [0,1).
    Stands in for decode→resize→embed; same shape contract as the real path.
    """
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:_FEAT_DIM], dtype=np.uint8).astype(np.float32) / 256.0


def decode_and_featurize(df: DataFrame, codec: str = "stub",
                         batch_hint: int = 256) -> DataFrame:
    """mapInPandas over media rows -> fixed-dim feature vectors.

    Arrow streams the binary payloads in bounded batches (set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` down for large media so
    executor memory stays bounded — payload bytes are NOT collected).
    """
    if codec != "stub":
        raise NotImplementedError(
            "real decoders (Pillow/ffmpeg) are unavailable in this "
            "environment; plumbing is exercised via codec='stub'")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "sha256": payloads.map(
                    lambda b: hashlib.sha256(b).hexdigest()),
                "feature": payloads.map(_stub_decode),
            })

    return df.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)
