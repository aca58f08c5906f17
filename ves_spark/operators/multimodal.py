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


def _decode_image_real(payload: bytes) -> list[float]:
    """Real codec path — requires Pillow (absent here by design)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires Pillow; this environment stubs it — "
            "use decode_mode='fake'"
        )
    raise NotImplementedError("wire PIL.Image.open here when available")


def extract_features(df: DataFrame, decode_mode: str = "fake") -> DataFrame:
    """Map-side feature extraction over Arrow batches.

    fake mode: deterministic 8-dim feature from the payload bytes
    (byte histogram moments) — exercises the full plumbing (binary in
    Arrow batches, vectorized numpy, array<float> out) without codecs.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            n_bytes = pdf["payload"].map(len).astype("int64")
            feats = np.zeros((n, 8), dtype=np.float32)
            checksum = np.zeros(n, dtype=np.int64)
            for i, payload in enumerate(pdf["payload"]):
                if decode_mode == "real":
                    _decode_image_real(payload)
                arr = np.frombuffer(payload, dtype=np.uint8)
                if len(arr):
                    checksum[i] = int(arr.astype(np.int64).sum() % 1_000_000_007)
                    hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
                    feats[i] = hist / max(len(arr), 1)
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
