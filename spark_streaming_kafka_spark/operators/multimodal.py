"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched pandas UDFs.

The Spark-side plumbing here is real and tested (schemas, partitioning,
UDF signatures, batch shapes — tests/test_multimodal.py); the actual
codec calls are stubbed because this container has no image/audio
libraries. Each stub is a deterministic fake clearly marked
``_STUB_DECODERS`` — swap in PIL/torchaudio/decord implementations with
identical signatures for production.

Scale doctrine for binary columns:

- Binary payloads ride the SAME parquet row-group as their metadata —
  no side files, so locality is free and predicate pushdown on metadata
  (e.g. ``kind = 'image'``, ``meta['width'] > 512``) prunes byte reads
  (parquet column chunks for unselected rows are never fetched).
- ``mapInPandas`` streams Arrow record batches through the Python
  worker; ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the
  per-batch memory (set it low for video rows — default 10k rows of
  multi-MB payloads would OOM the worker).
- Decode is CPU-heavy and embarrassingly parallel → repartition by a
  size-balanced key before decode if payload sizes are skewed (one
  4 GB video must not pin a partition-worth of small images behind it).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fake_dims(payload: bytes | None, kind: str) -> tuple[int, int, int, float]:
    """Deterministic stand-in for a real decode: dims derived from the
    payload hash. Replace with PIL/ffprobe; signature is the contract."""
    if payload is None:
        return (0, 0, 0, 0.0)
    h = hashlib.md5(bytes(payload)).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 300
    duration = 0.0 if kind == "image" else round(n_frames / 30.0, 3)
    return (width, height, n_frames, duration)


def _fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic fake embedding from payload bytes — stands in for a
    CLIP/CLAP-style encoder."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.md5(bytes(payload)).digest()
    return [round((h[i] - 128) / 128.0, 6) for i in range(dim)]


_STUB_DECODERS = True  # flip + replace fakes when real codecs are present


def extract_media_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """media(media_id, kind, payload, mime, meta) → MEDIA_FEATURES rows.

    One ``mapInPandas`` pass: decode + dims + feature per Arrow batch.
    Column pruning applies upstream — if a caller selects only
    ``media_id``/``width``, parquet still must deliver ``payload`` here,
    so run feature extraction ONCE and persist its (small) output
    rather than re-decoding per query.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [ _fake_dims(p, k) for p, k in zip(pdf["payload"], pdf["kind"]) ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "duration_s": [d[3] for d in dims],
                    "feature": [_fake_feature(p, feature_dim) for p in pdf["payload"]],
                }
            )

    schema = (
        "media_id long, kind string, width int, height int, "
        "n_frames int, duration_s double, feature array<float>"
    )
    return media.mapInPandas(run, schema=schema)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video → (media_id, frame_index) rows to decode, WITHOUT touching
    payloads: the fan-out is planned from metadata (n_frames), so the
    expensive decode UDF downstream receives an explicit work list it
    can repartition for balance. (sequence+explode = pure JVM.)"""
    feats = media.filter(F.col("kind") == "video")
    return (
        extract_media_features(feats)
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
                )
            ).alias("frame_index"),
        )
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: passes payload through a pandas UDF batch with
    the target dims recorded — the real implementation swaps the body
    for PIL ``Image.resize`` and returns re-encoded bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _STUB_DECODERS:
                out_payload = pdf["payload"]  # no-op stand-in
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": width,
                    "height": height,
                }
            )

    schema = "media_id long, payload binary, width int, height int"
    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=schema)
