"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* kernels are
deterministic fakes clearly marked below — but the Spark-side plumbing
(schema, batch iteration, partition-parallel UDF shape) is real and tested.
Swapping in PIL/ffmpeg later changes only `_fake_decode_*` internals.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int, n_frames int"

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, checksum long, feat array<float>"


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from documents: payload =
    utf-8 bytes of the text (stand-in for real image/audio bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("doc_id") % 16 + 1).cast("int").alias("n_frames"),
    )


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """FAKE DECODE — deterministic byte-histogram features in place of a real
    image/audio decoder (codecs not present in this container). Real
    implementation would decode payload and pool pixel/spectral features."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    total = max(sum(acc), 1)
    return [round(a / total, 6) for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` processes whole record batches per partition — the
    correct shape for decode-heavy multimodal work (amortizes Python
    dispatch; scales with executors; no shuffle).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "checksum": pdf["payload"].map(
                        lambda p: 0 if p is None else sum(p) % (1 << 31)
                    ).astype("int64"),
                    "feat": pdf["payload"].map(lambda p: _fake_decode_features(p, dim)),
                }
            )
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling plumbing: explode frame indices 0..n_frames-1 and
    keep every Nth — pure built-ins (the real decoder would mapInPandas over
    (media_id, frame_idx) after this row-explosion step)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_n == 0)
    )
