"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The Spark side is real and tested — schemas, batch iteration, partition
behavior, output shapes. The *codec* step is stubbed per the build
environment (no image/audio libraries in this container): ``decode=`` picks
either ``"fake"`` (a deterministic feature vector derived from the bytes'
md5 — stable across runs/partitions, so downstream ops are testable) or
``"real"`` (raises ``NotImplementedError`` with the integration point
documented — plug Pillow/torchaudio/pyav here on a real cluster).

Schema convention:
    media(media_id long, kind string in (image|audio|video),
          payload binary, meta struct<width int, height int,
          sample_rate int, n_frames int, mime string>)

Scale notes: payloads dominate row size — ``mapInPandas`` with the bounded
Arrow batch size from session.py keeps per-batch memory flat; feature
outputs drop the payload column immediately so downstream stages never
re-shuffle the binary blobs (column pruning at the source does the rest).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = ("media_id long, kind string, payload binary, "
             "meta struct<width: int, height: int, sample_rate: int, "
             "n_frames: int, mime: string>")

FEATURE_DIM = 8
FEATURES_DDL = "media_id long, kind string, feature array<float>"

RESIZE_DDL = ("media_id long, width int, height int, payload binary")


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in feature vector: bytes of md5(payload),
    scaled to [0, 1). Stable across partitions/runs."""
    digest = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """media → (media_id, kind, feature array<float>).

    ``decode="real"`` is the integration point for actual codecs; it raises
    ``NotImplementedError`` in this environment by design.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                raise NotImplementedError(
                    "real media decoding needs Pillow/torchaudio/pyav — "
                    "plug the codec in here; the Spark plumbing (schema, "
                    "batching, partitioning) is already in place")
            feats = [_fake_feature(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        _batches, schema=FEATURES_DDL)


def resize_images(media: DataFrame, width: int, height: int,
                  decode: str = "fake") -> DataFrame:
    """Image resize plumbing: filters kind='image', emits the target
    dimensions and (stub) payload. Fake mode passes the payload through —
    the *shape* of the operation (schema, filter, batching) is the tested
    contract."""
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                raise NotImplementedError("plug an image codec in here")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": width,
                "height": height,
                "payload": pdf["payload"],
            })

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(_batches, schema=RESIZE_DDL))


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_idx) for every ``n``-th
    frame, from metadata only — pure column algebra (``sequence``), no
    decode needed to *plan* the sampling."""
    vids = media.filter((F.col("kind") == "video")
                        & F.col("meta.n_frames").isNotNull()
                        & (F.col("meta.n_frames") > 0))
    return vids.select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata rollup per kind: counts + payload volume — the
    bookkeeping query a curation pipeline runs before/after each filter."""
    return (
        media.groupBy("kind")
        .agg(F.count("*").alias("n"),
             F.sum(F.length("payload")).alias("total_bytes"),
             F.avg(F.coalesce(F.col("meta.width"), F.lit(0))).alias("avg_width"))
    )
