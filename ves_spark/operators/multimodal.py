"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched kernels over
``mapInPandas``.

The Spark-side contract (schemas, partitioning, batch iteration, UDF
signatures) is real and tested; the actual codec step is stubbed —
this container has no image/audio libraries — behind
``_decode_image_real`` which raises ``NotImplementedError`` unless
Pillow is importable, with a deterministic fake
(``decode_mode='fake'``) used by tests and fixtures.

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
    """Real codec path — requires Pillow (absent here by design).
    Contract: payload bytes -> decoded raw bytes (pixel buffer); the
    vectorized feature math downstream is codec-agnostic."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires Pillow; this environment stubs it — "
            "use decode_mode='fake' or pass decode_fn"
        )
    raise NotImplementedError("wire PIL.Image.open here when available")


def extract_features(
    df: DataFrame, decode_mode: str = "fake", decode_fn=None
) -> DataFrame:
    """Map-side feature extraction over Arrow batches.

    fake mode: deterministic 8-dim feature straight from the payload
    bytes (byte histogram moments) — exercises the full plumbing
    (binary in Arrow batches, vectorized numpy, array<float> out)
    without codecs.

    real mode: each payload is decoded by ``decode_fn`` (default
    ``_decode_image_real``, which needs Pillow) — ``bytes -> raw
    decoded bytes``; injecting a toy codec makes the real path
    testable without media libraries.

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
                fn = decode_fn or _decode_image_real
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
