"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
interface a real decoder would use; everything Spark-side — schema,
batch iteration, partitioning, output typing — is real and tested.
Swap ``_fake_decode`` for PIL/librosa in a real deployment.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum string, "
    "width int, height int, n_frames int, feature_mean double"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image/audio decoder.

    A real implementation would go here (PIL.Image.open /
    soundfile.read); the container ships no codecs, so derive stable
    pseudo-metadata from the payload bytes instead.
    """
    digest = hashlib.sha256(payload).hexdigest()
    h = int(digest[:8], 16)
    return {
        "n_bytes": len(payload),
        "checksum": digest[:16],
        "width": 64 + (h % 1920),
        "height": 64 + ((h >> 8) % 1080),
        "n_frames": 1 + ((h >> 16) % 240),
        "feature_mean": round(sum(payload[:256]) / max(min(len(payload), 256), 1), 4),
    }


def decode_media(df: DataFrame, payload_col: str = "payload", type_col: str = "media_type") -> DataFrame:
    """mapInPandas decode over (doc_id, media_type, payload binary).

    Arrow-batched: each batch decodes vectorized-per-row in Python
    (decoders are per-item by nature) but transfers columnar.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "media_type", pdf[type_col].to_numpy())
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.mapInPandas(fn, schema=DECODE_SCHEMA)


def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a synthetic media table from document text payloads
    (binary column + type tag), run the decode pipeline. [rows-only:
    binary plumbing, no SQL equivalent]"""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return decode_media(media).orderBy("doc_id")


QUERIES = {"mm_decode": mm_decode}
ORACLES: dict[str, str] = {}
