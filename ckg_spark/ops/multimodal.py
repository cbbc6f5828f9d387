"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — exactly how the html column of the pages table
works. The Spark-side machinery (schemas, Arrow batching, mapInPandas
signatures, partitioning) is real and tested; the actual codec work is
stubbed deterministically because no image/audio libraries ship in this
container (clearly marked below — swap ``_fake_decode`` for a
PIL/torchaudio call on a real cluster; nothing else changes).

Scale notes: binary payloads are the one column you must NOT let a shuffle
drag around. Operators here project metadata/features out of the payload
in a narrow map, then drop the payload before any wide transformation —
the 100 TB rule: shuffle features, never bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", StructType([]), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def decode_media(payload: bytes) -> np.ndarray:
    """REAL CODEC GOES HERE. Not implemented in this container (no PIL /
    ffmpeg / torchaudio available); raise so nobody mistakes the fake
    features for decoded content."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "environment; production deployments plug PIL/ffmpeg in here"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for decode+feature-extract: dimensions and a
    FEATURE_DIM-float feature vector derived from sha256 of the bytes.
    Pure function of the payload -> same invariance guarantees as the real
    thing, so all plumbing tests are meaningful."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    raw = np.frombuffer(
        hashlib.sha256(b"feat" + payload).digest() + hashlib.sha256(b"feat2" + payload).digest(),
        dtype=np.uint8,
    )[:FEATURE_DIM]
    feats = (raw.astype(np.float32) / 255.0).round(6)
    return width, height, feats


def extract_media_features(
    media: DataFrame, id_col: str = "media_id", bytes_col: str = "payload", kind_col: str = "kind"
) -> DataFrame:
    """binary payloads -> (metadata, feature vector), Arrow-batched.
    The payload column is consumed inside the map and does not appear in
    the output schema — downstream shuffles move 16 floats, not megabytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, nb, ws, hs, feats = [], [], [], [], [], []
            for mid, kind, payload in zip(pdf[id_col], pdf[kind_col], pdf[bytes_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, fv = _fake_decode(data)
                ids.append(mid)
                kinds.append(kind)
                nb.append(len(data))
                ws.append(w if kind == "image" else None)
                hs.append(h if kind == "image" else None)
                feats.append(fv.tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "features": feats,
                }
            )

    return media.select(id_col, kind_col, bytes_col).mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n: int = 30, id_col: str = "media_id", nframes_col: str = "n_frames"
) -> DataFrame:
    """Video frame-sampling as a JVM-side explode of frame indices —
    the per-frame decode would then be a mapInPandas over this plan.
    (media_id, frame_idx); one row per sampled frame. Zero-frame media
    emit NO rows (filtered before the sequence: clamping the bound to 0
    instead would fabricate a phantom frame 0 the decode cannot read,
    and an unclamped sequence(0, -1) is an ANSI error)."""
    idxs = F.sequence(F.lit(0), F.col(nframes_col) - 1, F.lit(every_n))
    return (
        media.filter(F.col(nframes_col) >= 1)
        .select(F.col(id_col), F.explode(idxs).alias("frame_idx"))
    )


def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test adapter: wrap a text table's bytes as fake 'image' payloads so
    the multimodal plumbing is exercised end-to-end without real codecs."""
    return docs.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )
