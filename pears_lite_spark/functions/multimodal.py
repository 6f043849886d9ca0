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
    """REAL decode -> content features, no libraries: PNG/BMP pixels ->
    16-bin luma histogram, WAV samples -> 16-bin amplitude histogram
    (pure stdlib+numpy codecs in functions/codecs.py, implemented from
    the public format specs). Dispatch is by magic bytes, not `kind`,
    so mislabeled rows fail loudly. Video payloads still raise — a real
    container demuxer is out of scope for this sandbox and pretending
    otherwise would be a silent fake."""
    from . import codecs
    data = bytes(payload)
    if data[:8] == codecs.PNG_SIG:
        return codecs.image_features(codecs.decode_png(data), FEATURE_DIM)
    if data[:2] == b"BM":
        return codecs.image_features(codecs.decode_bmp(data), FEATURE_DIM)
    if data[:4] == b"RIFF":
        return codecs.audio_features(codecs.decode_wav(data)[0], FEATURE_DIM)
    raise NotImplementedError(
        f"no codec for this {kind} payload (magic {data[:4]!r}); register "
        "a decoder for the container in multimodal.DECODERS")


DECODERS = {"fake": _fake_decode, "real": _real_decode}


def _real_hist(payload: bytes, kind: str) -> np.ndarray:
    """Integer histogram counts behind _real_decode (decode once, no
    normalization) — serialized in-kernel for the value oracle so no
    engine-side float formatting can diverge."""
    from . import codecs
    data = bytes(payload)
    if data[:8] == codecs.PNG_SIG:
        return codecs.image_hist(codecs.decode_png(data), FEATURE_DIM)
    if data[:2] == b"BM":
        return codecs.image_hist(codecs.decode_bmp(data), FEATURE_DIM)
    if data[:4] == b"RIFF":
        return codecs.audio_hist(codecs.decode_wav(data)[0], FEATURE_DIM)
    raise NotImplementedError(f"no codec for {kind} payload")


FEATURES_HIST_SCHEMA = T.StructType(
    list(FEATURES_SCHEMA) + [T.StructField("hist_s", T.StringType())])


def extract_features_hist_df(media_df: DataFrame) -> DataFrame:
    """Strict REAL decode with the integer histogram serialized to a
    comma-joined string inside the kernel (exact integers, Python
    formatting on both engine and oracle side) — the oracle-facing twin
    of `extract_features_df(strict=True)`."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = [_real_hist(p if p is not None else b"", k)
                     for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0),
                "features": [list(h / max(1, int(h.sum()))) for h in hists],
                "hist_s": [",".join(str(int(x)) for x in h) for h in hists],
            })

    return (media_df.select("doc_id", "kind", "payload")
            .mapInPandas(kernel, schema=FEATURES_HIST_SCHEMA))


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


def _real_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize: decode PNG/BMP -> nearest-neighbour resample ->
    re-encode as canonical PNG (filter 0). Pure stdlib+numpy codecs."""
    from . import codecs
    data = bytes(payload)
    if data[:8] == codecs.PNG_SIG:
        arr = codecs.decode_png(data)
    elif data[:2] == b"BM":
        arr = codecs.decode_bmp(data)
    else:
        raise NotImplementedError(
            f"no image codec for payload (magic {data[:4]!r})")
    return codecs.encode_png(codecs.resize_nearest(arr, width, height))


def resize_media_df(media_df: DataFrame, width: int = 64,
                    height: int = 48, strict: bool = False) -> DataFrame:
    """Image resize over the binary column via Arrow-batched
    mapInPandas. `strict=True` runs the REAL path (PNG/BMP decode ->
    nearest resample -> PNG re-encode, functions/codecs.py); the
    default keeps the sha256 stand-in whose bytes the DuckDB oracle
    recomputes arithmetically."""
    resize = _real_resize if strict else _fake_resize

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "payload": [resize(p if p is not None else b"",
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


def _synth_image_arr(i: int) -> np.ndarray:
    """Deterministic test image: seeded noise + gradient, shape and
    channel count varying with i (gray / RGB / RGBA / gray+alpha) so
    every codec branch gets exercised."""
    h, w = 16 + (i % 5) * 7, 12 + (i % 7) * 5
    ch = (1, 3, 4, 2)[i % 4]
    rng = np.random.default_rng(1000 + i)
    base = rng.integers(0, 256, (h, w, ch), dtype=np.uint8).astype(np.int64)
    grad = (np.arange(h)[:, None] * 255 // max(1, h - 1))[:, :, None]
    arr = ((base + grad) // 2).astype(np.uint8)
    return arr[:, :, 0] if ch == 1 else arr


def _synth_audio_arr(i: int) -> np.ndarray:
    """Deterministic int16 test clip: two seeded tones + noise."""
    n = 800 + (i % 9) * 211
    t = np.arange(n, dtype=np.float64)
    rng = np.random.default_rng(2000 + i)
    sig = (8000.0 * np.sin(2 * np.pi * t * (0.01 + (i % 5) * 0.003))
           + 4000.0 * np.sin(2 * np.pi * t * 0.07)
           + rng.normal(0.0, 1500.0, n))
    return np.clip(sig, -32768, 32767).astype(np.int16)


def synth_media_real_items(n: int = 48) -> list:
    """Deterministic media rows with REAL payloads: images encoded as
    PNG (rotating scanline filter; every 4th image a 24-bit BMP) and
    audio as 16-bit PCM WAV, via functions/codecs.py. Video rows keep
    an opaque payload (no container codec in this sandbox) but carry
    real duration metadata for the frame-sample plan. Returns
    (doc_id, kind, payload, raw) tuples — `raw` is the pre-encode
    array, so the correctness oracle can compute expected features
    WITHOUT running the decoder (round-trip differential test)."""
    from . import codecs
    items = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            arr = _synth_image_arr(i)
            if i % 12 == 9 and arr.ndim == 3 and arr.shape[2] == 3:
                payload = codecs.encode_bmp(arr)
            else:
                payload = codecs.encode_png(arr, filter_type=i % 5)
            items.append((i, kind, payload, arr))
        elif kind == "audio":
            s = _synth_audio_arr(i)
            items.append((i, kind, codecs.encode_wav(s, 8000), s))
        else:
            payload = hashlib.sha256(f"video{i}".encode()).digest() * 8
            items.append((i, kind, payload, None))
    return items


def synth_media_real(spark, n: int = 48) -> DataFrame:
    """`synth_media_real_items` as a media-schema DataFrame."""
    rows = []
    for i, kind, payload, raw in synth_media_real_items(n):
        if kind == "image":
            h, w = raw.shape[:2]
            meta = ("image/png" if bytes(payload[:2]) != b"BM" else
                    "image/bmp", w, h, None)
        elif kind == "audio":
            meta = ("audio/wav", None, None, int(len(raw) * 1000 // 8000))
        else:
            meta = ("video/x-fake", None, None, 1000 * (1 + i % 30))
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
