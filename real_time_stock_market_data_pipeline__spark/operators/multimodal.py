"""Multimodal columns — images/audio/video as opaque ``binary`` columns
with typed metadata (SURVEY.md §2.10; no reference counterpart).

The Spark-side plumbing is real and tested: schemas, Arrow-batched
``mapInPandas`` signatures, partitioning-safe batch shapes. The actual
codec work (JPEG decode, resample, frame extraction) is STUBBED — the
image/audio libraries are not in this container — behind
``try: import PIL`` with a clearly-marked deterministic fallback, so
the pipeline shape is exercised end-to-end while the decode kernel is
swappable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: one opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _decode_real(payload: bytes, kind: str) -> list[float]:
    """Real decode path — requires codec libraries absent from this
    container. Reaching this without them is a deliberate, loud error
    rather than silently wrong features."""
    raise NotImplementedError(
        "codec libraries (PIL/torchaudio/av) not available in this "
        "environment; install them or use the deterministic stub"
    )


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake featurizer: FEATURE_DIM floats derived from
    the payload digest. Keeps every downstream stage (schema, batching,
    similarity search over media features) fully testable."""
    digest = hashlib.sha256(payload or b"").digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


try:  # pragma: no cover - container has no codec libs
    import PIL  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False


def extract_media_features(
    media: DataFrame, use_stub: bool | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payload column.

    ``mapInPandas`` streams record batches through Python — the decode
    kernel sees a ``pd.DataFrame`` per Arrow batch, never a per-row
    Python call, and the output schema is fixed (FEATURES_SCHEMA) so
    Catalyst plans around it like any other relation. Partitioning of
    the input is preserved; at scale, payload bytes never shuffle —
    extraction runs where the scan runs."""
    stub = (not _HAVE_CODECS) if use_stub is None else use_stub
    decode = _decode_stub if stub else _decode_real

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "content_sha": [
                        hashlib.sha256(p or b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "features": [
                        decode(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Test fixture adapter: wraps the documents table as a media table
    (utf-8 text bytes as the opaque payload) so the multimodal pipeline
    is exercisable against driver data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, use_stub: bool | None = None
) -> DataFrame:
    """Resize plumbing (MEDIA_SCHEMA → MEDIA_SCHEMA): Arrow-batched,
    payload-in/payload-out, metadata updated to the target dims. The
    pixel kernel is stubbed (deterministic digest-derived bytes) when
    codec libs are absent — the batching, schema, and partitioning
    behavior are the real thing; swap ``_decode_real``-style kernels in
    production. Payloads never shuffle: resize runs where the scan runs.
    """
    stub = (not _HAVE_CODECS) if use_stub is None else use_stub
    if not stub:
        _decode_real(b"", "image")  # loud, deliberate: no codecs here

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"resize:{width}x{height}:".encode()
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                hashlib.sha256(tag + (p or b"")).digest() for p in pdf["payload"]
            ]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, use_stub: bool | None = None
) -> DataFrame:
    """Frame sampling (MEDIA_SCHEMA → FRAMES_SCHEMA): one row per
    sampled frame at ``every_ms`` intervals — the one-to-many
    ``mapInPandas`` shape (a Python UDTF without the UDTF registration
    overhead). Frame count = duration_ms // every_ms + 1, or a single
    frame when duration is unknown. Stub kernel emits digest-derived
    frame bytes; the fan-out, schema, and batch shapes are real.

    Scale: output rows stay in the input partition (no shuffle); the
    expansion factor is bounded by duration/every_ms — pick the rate so
    frames-per-task fits memory, exactly as with any explode.
    """
    stub = (not _HAVE_CODECS) if use_stub is None else use_stub
    if not stub:
        _decode_real(b"", "video")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = 1 if pd.isna(dur) else int(dur) // every_ms + 1
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    payloads.append(
                        hashlib.sha256(
                            b"frame:%d:" % i + (p or b"")
                        ).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "payload": payloads,
                }
            )

    return media.mapInPandas(gen, schema=FRAMES_SCHEMA)
