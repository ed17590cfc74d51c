"""Multimodal column plumbing: opaque binary payloads + typed metadata.

[EXT] north-star surface. The design treats image/audio/video as
``BinaryType`` columns living beside typed metadata and embeddings in
ordinary tables (see ``multimodal_doc_embedding_join`` in
operators/llm.py); decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the ONE place this engine uses Python in a data
path, because media codecs don't exist as Catalyst expressions.

The actual codecs (pillow / librosa / av) are NOT installed in this
environment, so ``decode_image`` raises ``NotImplementedError`` and
the pipeline defaults to ``stub_features`` — a deterministic,
dependency-free featurizer over the raw bytes. Everything around the
decoder (schema handling, Arrow batch iteration, partition-preserving
execution) is real and tested; swapping in a real decoder is a
one-argument change.

Scale notes: ``mapInPandas`` streams Arrow batches executor-side — no
collect, no shuffle; partitioning and column pruning of the input
plan are preserved. Keep payload columns OUT of shuffle keys and
project them away before any join that doesn't need the bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: canonical schema for a media table: payload + typed metadata.
MEDIA_SCHEMA = (
    "media_id BIGINT, media_type STRING, payload BINARY, "
    "width INT, height INT, duration_ms BIGINT"
)

FEATURES_COL = "features"
FEATURE_DIM = 8


def decode_image(payload: bytes) -> "pd.DataFrame":
    """Real image decode — requires an imaging library.

    Deliberately stubbed: this container has no pillow/opencv. The
    mapInPandas plumbing around it is real; plug a decoder in via
    ``extract_features(..., decoder=...)``.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. pillow), "
        "which is not available in this environment; pass a custom "
        "decoder to extract_features()"
    )


def stub_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic, dependency-free byte-level featurizer.

    Stands in for a real decode+embed step: per-bucket byte histograms
    normalized by length. Same bytes → same features, on any worker,
    any batch size — which is what the tests pin down.
    """
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    n = float(len(payload))
    return [c / n for c in counts]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    decoder: Callable[[bytes], list[float]] | None = None,
    feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """Append a ``features array<double>`` column via Arrow-batched
    ``mapInPandas`` over the binary payload column.

    The decoder is a plain ``bytes -> list[float]`` callable applied
    per payload inside each Arrow batch (default: ``stub_features``).
    Output schema = input schema + features, so the operator composes
    with any upstream plan; no shuffle is introduced.
    """
    dec = decoder or (lambda b: stub_features(b, feature_dim))
    # copy the field list — StructType.add mutates in place, and
    # df.schema hands back a cached object
    out_schema = StructType(
        list(df.schema.fields) + [StructField(FEATURES_COL, ArrayType(DoubleType()))]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [dec(bytes(p) if p is not None else b"") for p in pdf[payload_col]]
            yield pdf.assign(**{FEATURES_COL: feats})

    return df.mapInPandas(run, schema=out_schema)


def stub_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a raster resize: clamps the payload
    to ``width * height`` bytes (a real resizer decodes, resamples and
    re-encodes; this container has no codec). Same bytes + same target
    → same output on any worker."""
    if payload is None:
        return b""
    return bytes(payload[: width * height])


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize every media payload to ``width x height`` via Arrow-batched
    ``mapInPandas``; the ``width``/``height`` metadata columns are
    rewritten to the target. Schema-preserving and shuffle-free —
    composes anywhere in a media pipeline. Swap a real decoder-backed
    resizer in via ``resizer=``; the default is the deterministic stub.
    """
    rz = resizer or stub_resize

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [
                rz(bytes(p) if p is not None else b"", width, height)
                for p in pdf[payload_col]
            ]
            if "width" in pdf.columns:
                pdf["width"] = width
            if "height" in pdf.columns:
                pdf["height"] = height
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


#: output schema of sample_frames — one row per sampled frame.
FRAMES_SCHEMA = "media_id BIGINT, frame_idx INT, frame_payload BINARY"


def stub_frame_slices(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for video frame extraction: splits the
    payload into ``n_frames`` contiguous byte slices (a real sampler
    would demux + decode keyframes)."""
    if payload is None or len(payload) == 0 or n_frames <= 0:
        return []
    step = max(1, len(payload) // n_frames)
    return [bytes(payload[i * step : (i + 1) * step]) for i in range(n_frames)]


def sample_frames(
    df: DataFrame,
    n_frames: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Sample ``n_frames`` frames per media row — the 1→N mapInPandas
    shape (each input row fans out to one row per frame, schema
    ``FRAMES_SCHEMA``). Fan-out happens inside the Arrow batch on the
    executor that holds the payload: bytes never move for sampling, and
    the output inherits the input partitioning (frames of one video
    stay co-located for downstream per-video ops).
    """
    smp = sampler or stub_frame_slices

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                frames = smp(bytes(p) if p is not None else b"", n_frames)
                for i, fr in enumerate(frames):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped table from the documents fixture,
    using the UTF-8 text bytes as the opaque payload (the container
    ships no real media); metadata columns are derived deterministically
    so tests can assert exact values."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
    )
