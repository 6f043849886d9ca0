"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract is real and tested — schemas, partition-safe
mapInPandas batch shape, typed metadata structs; only the codec inner
step is stubbed (no image/audio libraries in this container), behind
`DECODERS`, which either raises NotImplementedError (`strict=True`) or
produces a deterministic fake derived from the bytes (`strict=False`,
default — keeps pipelines runnable end-to-end).

Layout: media(doc_id:long, kind:string, payload:binary,
meta:struct<mime:string, width:int, height:int, duration_ms:int>).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for image-decode/feature-extract: FEATURE_DIM
    doubles from sha256 over `kind + hex(payload)` (hex keeps the hash
    input VARCHAR-expressible so the driver's DuckDB oracle can recompute
    it bit-for-bit). Swap for a real decoder (PIL / torchaudio / pyav)
    outside this sandbox."""
    h = hashlib.sha256((kind + bytes(payload).hex()).encode()).digest()
    arr = np.frombuffer(h[:FEATURE_DIM * 2], dtype="<u2").astype(np.float64)
    return arr / 65535.0


def _real_decode(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        f"no {kind} codec available in this environment; install an image/"
        "audio library and register it in multimodal.DECODERS")


DECODERS = {"fake": _fake_decode, "real": _real_decode}


def extract_features_df(media_df: DataFrame, strict: bool = False) -> DataFrame:
    """media -> per-item feature vectors via Arrow-batched mapInPandas.
    The batch shape (never per-row Python dispatch into Spark, one numpy
    matrix out per batch) is the production pattern; only the inner
    decode is stubbed."""
    decode = DECODERS["real" if strict else "fake"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p if p is not None else b"", k)
                     for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0),
                "features": [list(f) for f in feats],
            })

    return (media_df.select("doc_id", "kind", "payload")
            .mapInPandas(kernel, schema=FEATURES_SCHEMA))


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per frame timestamp to decode
    — pure column algebra (sequence + explode), so the expensive decode
    fans out across executors with no skew (long videos split into many
    rows)."""
    n_frames = F.greatest(F.floor(F.col("meta.duration_ms") / every_ms),
                          F.lit(1)).cast("int")
    return (media_df.filter(F.col("kind") == "video")
            .select("doc_id",
                    F.explode(F.sequence(
                        F.lit(0), n_frames - 1)).alias("frame_idx"))
            .withColumn("ts_ms", F.col("frame_idx") * every_ms))


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: sha256 over the
    target geometry + hex(payload) (VARCHAR-expressible for the DuckDB
    oracle, like _fake_decode). Swap for PIL outside this sandbox."""
    return hashlib.sha256(
        f"resize:{width}x{height}:{bytes(payload).hex()}".encode()).digest()


def resize_media_df(media_df: DataFrame, width: int = 64,
                    height: int = 48, strict: bool = False) -> DataFrame:
    """Image resize over the binary column via Arrow-batched
    mapInPandas — the same stub-gated pattern as extract_features_df
    (no image libs in this sandbox; plumbing, batching and the typed
    output schema are real and oracle-checked)."""
    if strict:
        raise NotImplementedError(
            "no image codec available; install PIL and swap _fake_resize")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "payload": [_fake_resize(p if p is not None else b"",
                                         width, height)
                            for p in pdf["payload"]],
                "width": width,
                "height": height,
            })

    return (media_df.filter(F.col("kind") == "image")
            .select("doc_id", "kind", "payload")
            .mapInPandas(kernel, schema=RESIZED_SCHEMA))


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 7)
        rows.append((i, kind, bytearray(payload),
                     (f"{kind}/x-fake", 64 + i % 512, 48 + i % 256,
                      1000 * (1 + i % 30))))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
