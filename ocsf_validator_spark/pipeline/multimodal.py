"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing — schema, batch shape, partition sizing, UDF
signatures — is real and tested; the actual codec step is STUBBED
(image/audio libraries are not available in this environment) behind
``decode_stub``: a deterministic fake that derives "features" from the
bytes, or raises NotImplementedError when ``strict=True``.

Scale notes: binary payloads dominate row size, so the pipeline
(a) carries only (id, payload) into the Arrow stage — column pruning
keeps metadata scans payload-free; (b) uses mapInPandas so one task
streams batches without materializing the whole partition; (c) bounds
Arrow batch bytes via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id bigint, media_type string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "id bigint, n_bytes bigint, sha256 string, feature array<double>"


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Manufacture a media-shaped table from a text table (test/bench
    stand-in: payload = utf-8 bytes). Demonstrates the binary column +
    typed metadata schema contract."""
    return df.select(
        F.col(id_col).alias("id"),
        F.lit("text/plain").alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.length(F.col(text_col)).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def payload_metadata(media: DataFrame) -> DataFrame:
    """Pure-column metadata extraction (no UDF): byte length + sha256.
    This is the fast path — runs at scan speed, payload never leaves
    the JVM."""
    return media.select(
        "id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: bytes →
    fixed-dim feature by folding byte values into ``dim`` buckets
    (vectorized: numpy frombuffer + reshape-sum, no per-byte loop)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    n = max(len(arr), 1)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad)])
    return (arr.reshape(-1, dim).sum(axis=0) / n).tolist()


def decode_features(
    media: DataFrame, dim: int = 8, strict: bool = False
) -> DataFrame:
    """Arrow-batched decode / feature-extract over mapInPandas.

    ``strict=True`` raises NotImplementedError — the marker that a real
    codec (PIL/ffmpeg/torchaudio) belongs here; the deterministic fake
    keeps the distributed plumbing testable without those libraries.
    """
    if strict:
        raise NotImplementedError(
            "real media decode requires codec libraries not present in "
            "this environment; wire PIL/ffmpeg here"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: _fake_feature(bytes(b), dim)
                    ),
                }
            )

    return media.select("id", "payload").mapInPandas(batches, FEATURE_SCHEMA)
