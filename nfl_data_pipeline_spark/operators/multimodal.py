"""Multimodal column conventions + processing plumbing.

Convention: media travels as an opaque ``binary`` column (``content``)
next to a typed metadata struct (``media_meta``: mime, width, height,
duration_ms, n_frames). Decode / feature-extract / resize / frame-
sample run as Arrow-batched ``mapInPandas`` stages — the Spark-side
plumbing (schema, batching, partition parallelism) is real and
tested; the codec itself is stubbed because no image/audio libraries
exist in this container (clearly marked below).

At 100 TB the shape matters more than the codec: binary payloads
dominate partition size, so ``spark.sql.files.maxPartitionBytes`` and
explicit ``repartition`` before a decode stage keep Arrow batches
bounded; the metadata struct lets filters (mime, dimensions) prune
before any bytes are decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Wrap an existing column as (content binary, media_meta struct)."""
    return df.withColumn("content", F.col(payload_col).cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


def decode_media(payload: bytes, mime: str):
    """REAL DECODE STUB — image/audio codecs are not available in this
    container. A deployment wires PIL/torchaudio/decord here; the
    engine-side contract (bytes + mime in, array out) is what the
    pipeline tests."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use "
        "fake_feature() for deterministic tests"
    )


def fake_feature(payload: bytes, dims: int = 4) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: byte-sum
    statistics per stride. Keeps every test reproducible without
    codecs."""
    if not payload:
        return [0.0] * dims
    return [
        float(sum(payload[i::dims]) % 997) for i in range(dims)
    ]


def extract_features(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, content,
    media_meta) via mapInPandas — the real plumbing: iterator of
    pandas batches in, bounded memory, partition-parallel."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["content"]
            mimes = pdf["media_meta"].apply(lambda m: m["mime"])
            if use_real_codec:
                feats = [
                    decode_media(p, m) for p, m in zip(payloads, mimes)
                ]
            else:
                feats = [fake_feature(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": mimes,
                    "n_bytes": payloads.apply(len).astype("int64"),
                    "content_hash": payloads.apply(
                        lambda p: hashlib.md5(bytes(p)).hexdigest()
                    ),
                    "feature": feats,
                }
            )

    return df.select("doc_id", "content", "media_meta").mapInPandas(
        _extract, FEATURE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_ix", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame, every_ms: int = 1000, use_real_codec: bool = False
) -> DataFrame:
    """Frame sampling: one input video row → N frame rows (the
    UDTF-shaped mapInPandas stage — output cardinality differs from
    input, which a pandas_udf can't express). Frame count comes from
    the metadata struct (duration_ms / every_ms, min 1), so the
    fan-out is known per-row WITHOUT decoding; the frame payload is
    the CODEC STUB: deterministic byte slices stand in for decoded
    frames (decord/ffmpeg wire in here in a deployment).
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_ix": [], "frame_ms": [], "frame_bytes": []}
            for _, r in pdf.iterrows():
                payload = bytes(r["content"])
                meta = r["media_meta"]
                dur = meta["duration_ms"] or every_ms
                n = max(1, int(dur) // every_ms)
                if use_real_codec:
                    decode_media(payload, meta["mime"])  # raises: stub
                step = max(1, len(payload) // n) if payload else 1
                for i in range(n):
                    rows["doc_id"].append(r["doc_id"])
                    rows["frame_ix"].append(i)
                    rows["frame_ms"].append(i * every_ms)
                    rows["frame_bytes"].append(
                        payload[i * step : (i + 1) * step]
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "content", "media_meta").mapInPandas(
        _sample, FRAME_SCHEMA
    )


def resize_meta(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: rewrite the metadata struct (the part the
    engine owns — pure JVM expression, no UDF) while the payload
    transform stays in the codec layer. Filters on the NEW dimensions
    prune before any decode stage runs."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.col("media_meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("media_meta.duration_ms").alias("duration_ms"),
            F.col("media_meta.n_frames").alias("n_frames"),
        ),
    )
