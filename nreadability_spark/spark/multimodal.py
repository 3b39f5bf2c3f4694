"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Real Spark plumbing (schemas, partitioning, Arrow batch shapes, one-to-many
frame explosion) with the codec boundary stubbed deterministically: this
container has no image/audio libraries, so payloads carry a 16-byte fake
header (magic, kind, width/height or rate/duration) that the "decoder"
parses. Swapping `_decode_payload` for a real PIL/ffmpeg call is the only
change needed on a cluster with media libs installed.
"""

from __future__ import annotations

import hashlib
import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

from .job import ensure_package_shipped

_MAGIC = b"NRSM"
_KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("url", StringType()),
    StructField("kind", StringType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("ok", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("payload_bytes", LongType()),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("frame", BinaryType()),
])


def _fake_payload(media_id: int, kind: str) -> bytes:
    w = 64 + (media_id % 32) * 8
    h = 48 + (media_id % 24) * 8
    rate = 8000 + (media_id % 5) * 8000
    dur = 500 + (media_id % 20) * 250
    header = _MAGIC + struct.pack(
        ">BxHHHHI", _KINDS.index(kind), w, h, rate & 0xFFFF, 0, dur)
    body = hashlib.sha256(f"{media_id}:{kind}".encode()).digest()
    reps = 16 + (media_id % 64)
    return header + body * reps


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from the documents table ids."""
    ensure_package_shipped(spark)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "url", "kind", "payload",
                                    "width", "height", "sample_rate",
                                    "duration_ms")}
            for doc_id in pdf["doc_id"]:
                mid = int(doc_id)
                kind = _KINDS[mid % 3]
                payload = _fake_payload(mid, kind)
                rows["media_id"].append(mid)
                rows["url"].append(
                    f"https://host{mid % 97}.example.org/media/{mid}")
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["width"].append(64 + (mid % 32) * 8
                                     if kind == "image" else None)
                rows["height"].append(48 + (mid % 24) * 8
                                      if kind == "image" else None)
                rows["sample_rate"].append(8000 + (mid % 5) * 8000
                                           if kind == "audio" else None)
                rows["duration_ms"].append(500 + (mid % 20) * 250
                                           if kind != "image" else None)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen, MEDIA_SCHEMA)


def _decode_payload(payload: bytes) -> tuple[str, np.ndarray]:
    """Stub decode: parses the deterministic fake header and returns the
    body as a uint8 array. On a real cluster this is the PIL / soundfile /
    pyav call; the surrounding plumbing is identical."""
    if payload[:4] != _MAGIC:
        raise ValueError("unknown codec")
    kind = _KINDS[payload[4]]
    return kind, np.frombuffer(payload[16:], dtype=np.uint8)


def extract_features(media: DataFrame, dims: int = 16) -> DataFrame:
    """Vectorized feature extraction over binary payloads: folded byte
    histogram, L2-normalized float32 — the Arrow batch shape a real
    embedding model UDF would use."""
    spark = media.sparkSession
    ensure_package_shipped(spark)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "ok": [], "feature": [],
                   "payload_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                out["payload_bytes"].append(
                    len(payload) if payload is not None else 0)
                try:
                    kind, arr = _decode_payload(bytes(payload))
                    hist = np.bincount(arr % dims, minlength=dims) \
                        .astype(np.float32)
                    norm = float(np.linalg.norm(hist))
                    feat = (hist / norm if norm > 0 else hist)
                    out["kind"].append(kind)
                    out["ok"].append("ok")
                    out["feature"].append([float(x) for x in feat])
                except Exception as exc:
                    out["kind"].append(None)
                    out["ok"].append(f"decode_error: {exc}"[:100])
                    out["feature"].append(None)
            yield pd.DataFrame(out)

    return (media.select("media_id", "payload")
            .repartition(F.xxhash64("media_id"))
            .mapInPandas(featurize, FEATURES_SCHEMA))


def sample_frames(media: DataFrame, every_n: int = 4,
                  frame_bytes: int = 256) -> DataFrame:
    """One-to-many frame sampling for video payloads (mapInPandas rows
    explode: each input row yields 0..k frame rows)."""
    spark = media.sparkSession
    ensure_package_shipped(spark)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "video" or payload is None:
                    continue
                body = bytes(payload)[16:]
                blocks = [body[i:i + frame_bytes]
                          for i in range(0, len(body), frame_bytes)]
                for frame_no, block in enumerate(blocks[::every_n]):
                    out["media_id"].append(int(mid))
                    out["frame_no"].append(frame_no)
                    out["frame"].append(block)
            yield pd.DataFrame(out)

    return (media.select("media_id", "kind", "payload")
            .mapInPandas(sample, FRAMES_SCHEMA))
