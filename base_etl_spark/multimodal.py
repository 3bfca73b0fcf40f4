"""Multimodal column plumbing (SURVEY §2.10 / task brief).

Design: image/audio/video payloads are opaque `binary` columns traveling
next to typed metadata. All Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signatures — is real and tested; the actual codec
call is STUBBED (this container has no image/audio libraries) behind
`decode_image_stub`, a deterministic fake with the same interface a real
decoder (PIL/libvips/ffmpeg) would have. Swapping in a real decoder
changes ONE function.

The fixtures carry no binary column, so the declared query derives one
(utf-8 encode of text) — which also makes the bytes cross-engine
checkable (mm_binary_features is a D row: sha/length/prefix of the blob
match DuckDB's blob functions).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from base_etl_spark.io import Tables
from base_etl_spark.registry import query

#: schema of a multimodal asset table at scale: payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", IntegerType()),  # 0=image 1=audio 2=video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Derive the opaque binary column (utf-8 bytes of text stand in for
    a real media payload)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        "lang",
        "n_chars",
    )


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decoder — deterministic fake with a real decoder's interface.

    A production build replaces the body with e.g. PIL.Image.open(
    io.BytesIO(payload)); everything downstream (feature shape, batch
    plumbing) is unchanged. The fake folds the bytes into a fixed 8-dim
    'feature' so tests have stable values.
    """
    if payload is None:
        raise NotImplementedError("real decoder not available in this environment")
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % 8
    arr = np.pad(arr, (0, pad)).reshape(-1, 8)
    return arr.mean(axis=0) / 255.0


_FEAT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract over mapInPandas: payloads arrive in Arrow
    batches, the (stubbed) decoder runs per asset, features leave as a
    fixed-width array column. At 100 TB: repartition by asset_id range so
    batches are even, and decoders never cross the Python boundary
    per-row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                np.round(decode_image_stub(p), 6).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=_FEAT_SCHEMA)


@query(
    "mm_binary_features",
    oracle="""
    SELECT doc_id                                   AS asset_id,
           octet_length(encode(text))               AS n_bytes,
           sha256(text)                             AS payload_sha,
           substr(text, 1, 4)                       AS head_chars
    FROM documents
    """,
)
def mm_binary_features(t: Tables) -> DataFrame:
    """Binary-column metadata surface (D row): byte length, digest, head
    bytes — the engine-neutral slice of the multimodal path. The decode /
    feature-extract stage is exercised in tests (stubbed decoder)."""
    payload = F.encode("text", "utf-8")
    return t.documents.select(
        F.col("doc_id").alias("asset_id"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2("text", 256).alias("payload_sha"),
        F.substring("text", 1, 4).alias("head_chars"),
    )


def resize_image_stub(payload: bytes, width: int = 32, height: int = 32) -> bytes:
    """STUB resize — a real build calls PIL/libvips and returns re-encoded
    bytes; the fake deterministically re-buckets the payload to
    width*height bytes so downstream batch shapes are realistic."""
    if payload is None:
        raise NotImplementedError("real codec not available in this environment")
    arr = np.frombuffer(payload, dtype=np.uint8)
    idx = (np.arange(width * height) * max(len(arr), 1) // (width * height)) % max(len(arr), 1)
    return arr[idx].tobytes()


def sample_frames_stub(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """STUB video frame sampler — evenly spaced 'frames' (byte slices).
    A real build hands payload to ffmpeg/pyav and returns encoded frames;
    the per-frame downstream plumbing (explode to one row per frame) is
    identical."""
    if payload is None:
        raise NotImplementedError("real codec not available in this environment")
    n = max(len(payload) // n_frames, 1)
    return [payload[i * n : (i + 1) * n] for i in range(n_frames)]


_FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """1 asset -> n_frames rows via mapInPandas (Arrow batches in, long
    table out) — the video pre-processing shape: decode once per asset,
    emit per-frame rows for downstream featurization."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_no": [], "frame": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i, fr in enumerate(sample_frames_stub(payload, n_frames)):
                    out["asset_id"].append(aid)
                    out["frame_no"].append(i)
                    out["frame"].append(fr)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(run, schema=_FRAME_SCHEMA)


def decode_audio_stub(payload: bytes, sample_rate: int = 16_000) -> np.ndarray:
    """STUB audio decoder — a real build calls ffmpeg/soundfile and
    returns a float waveform; the fake maps bytes to [-1, 1) samples so
    downstream feature code (framing, energy, spectrogram shapes) runs
    against realistic arrays."""
    if payload is None:
        raise NotImplementedError("real codec not available in this environment")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return (arr - 128.0) / 128.0


@query(
    "mm_frame_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id AS asset_id, text,
               greatest(octet_length(encode(text)) // 4, 1) AS flen
        FROM documents
    )
    SELECT asset_id, frame_no,
           octet_length(encode(substr(text, frame_no * flen + 1, flen)))
               AS n_bytes,
           sha256(substr(text, frame_no * flen + 1, flen)) AS frame_sha
    FROM d, (SELECT unnest([0, 1, 2, 3]) AS frame_no)
    WHERE octet_length(encode(substr(text, frame_no * flen + 1, flen))) > 0
    """,
)
def mm_frame_stats(t: Tables) -> DataFrame:
    """Frame-sampling plumbing, driver-checked end to end: the derived
    binary payload goes through the REAL mapInPandas frame sampler (Arrow
    batches in, one row per frame out), and the per-frame byte lengths +
    digests are hash-verified against DuckDB slicing the same bytes with
    substr arithmetic (fixture text is ASCII, so char slices == byte
    slices). This certifies the batch shape, the 1->N row explosion, and
    the slice arithmetic — everything a real ffmpeg build would reuse
    unchanged.

    This key is deliberately ON the Python boundary (mapInPandas): codec
    work cannot be a JVM expression; the plan-audit whitelist documents
    it next to the four UDF-surface demos. Empty tail frames (payload
    shorter than 4 bytes) are dropped on both sides."""
    n = t.documents.sparkSession.sparkContext.defaultParallelism
    # re-spread the single-file fixture before the Python stage — same
    # rationale as llm_dedup._spread: codec work is expensive PER ROW, so
    # every core must hold a batch even when the input bytes are small
    assets = with_binary_payload(t.documents).repartition(n, "asset_id")
    frames = sample_frames(assets, n_frames=4)
    return frames.filter(F.octet_length("frame") > 0).select(
        "asset_id",
        "frame_no",
        F.octet_length("frame").cast("bigint").alias("n_bytes"),
        F.sha2("frame", 256).alias("frame_sha"),
    )
