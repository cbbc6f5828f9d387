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
    """Decode an IMAGE payload to an H x W x 3 uint8 RGB array. Prefers
    PIL when installed (any format PIL knows); otherwise the vendored
    stdlib decoders below handle PNG (8-bit gray/RGB/RGBA,
    non-interlaced) and uncompressed 24-bit BMP — so real pixels ARE
    decoded even in codec-less environments, asserted bit-exact against
    a test-side encoder. Audio/video (and exotic image formats without
    PIL) still raise loudly: those genuinely need ffmpeg/torchaudio."""
    try:
        import io

        from PIL import Image  # optional dep, like openpyxl in readers

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        pass
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "payload is not PNG/BMP and no image library is installed; "
        "audio/video decoding requires ffmpeg/torchaudio (optional deps)"
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> np.ndarray:
    """Stdlib PNG subset decoder: 8-bit depth, color types 0 (gray),
    2 (RGB), 6 (RGBA), no interlace. Chunk walk + zlib + the five
    per-row filters (spec section 9); alpha is dropped, gray is
    replicated to RGB. Payloads are dimension-bounded per row of the
    media frame, and this runs inside the Arrow batch map — per-pixel
    python cost is bounded by the same batch sizing as the fake path."""
    import struct
    import zlib

    pos = 8
    idat = b""
    width = height = None
    color_type = bit_depth = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or color_type not in (0, 2, 6) or interlace:
                raise NotImplementedError(
                    f"PNG subset: bit_depth={bit_depth} color_type="
                    f"{color_type} interlace={interlace} not supported "
                    "without PIL"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = width * channels
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for x in range(channels, stride):
                row[x] = (row[x] + row[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                ul = prev[x - channels] if x >= channels else 0
                row[x] = (row[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[r] = row
        prev = row
    arr = out.reshape(height, width, channels)
    if channels == 1:
        return np.repeat(arr, 3, axis=2)
    return arr[:, :, :3].copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Stdlib BMP decoder: uncompressed 24-bit BI_RGB only (the format
    the reference's report assets use when rasterized)."""
    import struct

    (data_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP subset: {bpp}-bit compression={compression} not "
            "supported without PIL"
        )
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = []
    for r in range(height):
        off = data_off + r * stride
        row = np.frombuffer(
            payload, dtype=np.uint8, count=width * 3, offset=off
        ).reshape(width, 3)[:, ::-1]  # BGR -> RGB
        rows.append(row)
    if bottom_up:
        rows.reverse()
    return np.stack(rows)


def real_features(arr: np.ndarray) -> np.ndarray:
    """FEATURE_DIM-bin normalized luminance histogram of decoded pixels
    — the real counterpart of _fake_decode's hash features."""
    lum = (
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    )
    hist, _ = np.histogram(lum, bins=FEATURE_DIM, range=(0.0, 256.0))
    return (hist / max(1, lum.size)).astype(np.float32).round(6)


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
    media: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "payload",
    kind_col: str = "kind",
    codec: str = "fake",
) -> DataFrame:
    """binary payloads -> (metadata, feature vector), Arrow-batched.
    The payload column is consumed inside the map and does not appear in
    the output schema — downstream shuffles move 16 floats, not megabytes.

    ``codec="real"`` decodes actual pixels via :func:`decode_media`
    (PIL when installed, else the vendored stdlib PNG/BMP decoders) and
    emits true dimensions + a luminance histogram; undecodable payloads
    raise rather than silently degrade. ``codec="fake"`` (default) is
    the deterministic hash stand-in the catalog queries use over text
    payloads — clearly subordinate: same plumbing, no pixels."""
    if codec not in ("fake", "real"):
        raise ValueError(f"codec must be 'fake' or 'real', got {codec!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, nb, ws, hs, feats = [], [], [], [], [], []
            for mid, kind, payload in zip(pdf[id_col], pdf[kind_col], pdf[bytes_col]):
                data = bytes(payload) if payload is not None else b""
                if codec == "real":
                    arr = decode_media(data)
                    h, w = arr.shape[0], arr.shape[1]
                    fv = real_features(arr)
                else:
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
