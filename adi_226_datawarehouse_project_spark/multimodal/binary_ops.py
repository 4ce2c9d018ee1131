"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata.

The container has no image/audio codecs, so the decode step is a
clearly marked stub (deterministic fake features derived from the raw
bytes, or NotImplementedError in strict mode). Everything around the
stub is real and tested: schema, Arrow batch shape, mapInPandas
partition flow, and the pure-SQL byte-level features — exactly the
plumbing a real decoder would plug into.

Design for 100 TB: binary payloads are processed with ``mapInPandas``
(Arrow batches; one Python worker per partition, not per row).
Payload-heavy tables should be range-partitioned on the id so batch
sizes stay bounded; metadata-only queries never touch the binary
column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STRICT_DECODE = False  # True → decode raises NotImplementedError

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, channels int, mean_luma double"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Model a multimodal table: treat the UTF-8 bytes of `text_col`
    as the opaque media payload + typed metadata columns."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.col(text_col)).alias("payload_bytes"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_binary_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure-SQL byte-level features (no decode): size, first-byte tag,
    md5. These run JVM-side and scale like any projection."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col))).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )


def decode_image_stub(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """'Decode' each payload into image features via mapInPandas.

    STUB: real deployment swaps `_fake_decode` for PIL/libvips; the
    Spark-side contract (Arrow batch in → typed columns out) is what
    this verifies. Fake features are deterministic functions of the
    bytes so tests are stable."""

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if STRICT_DECODE:
                raise NotImplementedError("image decode requires PIL/libvips (not in container)")
            payload = pdf[payload_col]
            n = payload.str.len().fillna(0).astype("int32")
            first = payload.map(lambda b: b[0] if isinstance(b, (bytes, bytearray)) and b else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n,
                    "width": (n % 640).astype("int32") + 1,
                    "height": (n % 480).astype("int32") + 1,
                    "channels": 3,
                    "mean_luma": (first.astype("float64") % 256.0) / 255.0,
                }
            )

    return df.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, new_width int, new_height int, scale double"
)


def resize_image_stub(
    df: DataFrame, max_width: int = 224, max_height: int = 224, id_col: str = "doc_id"
) -> DataFrame:
    """'Resize' decoded images to fit (max_width, max_height)
    preserving aspect ratio, via mapInPandas over the decoded-feature
    batches (input = decode_image_stub output).

    STUB boundary: a real deployment resamples pixel buffers here
    (PIL/cv2); the geometry math, Arrow batch flow, and output schema
    are the real contract and are exact (pure IEEE-double ops, so the
    DuckDB oracle reproduces them bit-for-bit)."""

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if STRICT_DECODE:
                raise NotImplementedError("image resize requires PIL/cv2 (not in container)")
            w = pdf["width"].astype("float64").to_numpy()
            h = pdf["height"].astype("float64").to_numpy()
            scale = np.minimum(np.minimum(max_width / w, max_height / h), 1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": np.maximum(1, np.floor(w * scale)).astype("int32"),
                    "new_height": np.maximum(1, np.floor(h * scale)).astype("int32"),
                    "scale": scale,
                }
            )

    return df.mapInPandas(_resize_batches, schema=RESIZED_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, duration_s double, rms double"
)


def decode_audio_stub(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", sample_rate: int = 16000
) -> DataFrame:
    """'Decode' audio payloads (16-bit mono PCM model: 2 bytes per
    sample) into waveform-level features via mapInPandas.

    STUB: real deployment decodes with soundfile/ffmpeg; the fake
    features are deterministic integer functions of the bytes so the
    oracle can verify the plumbing end-to-end."""

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if STRICT_DECODE:
                raise NotImplementedError("audio decode requires soundfile/ffmpeg (not in container)")
            payload = pdf[payload_col]
            n = payload.str.len().fillna(0).astype("int64")
            first = payload.map(
                lambda b: b[0] if isinstance(b, (bytes, bytearray)) and b else 0
            ).astype("int64")
            n_samples = n // 2
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "sample_rate": sample_rate,
                    "n_samples": n_samples,
                    "duration_s": n_samples.astype("float64") / float(sample_rate),
                    "rms": ((first * 31 + n) % 1000).astype("float64") / 1000.0,
                }
            )

    return df.mapInPandas(_decode_batches, schema=AUDIO_SCHEMA)


def sample_frames_stub(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", every_n_bytes: int = 64
) -> DataFrame:
    """'Frame sampling': one row per sampled offset of the payload —
    the explode-shaped output a video frame sampler produces. Offsets
    are computed JVM-side; only the (stubbed) per-frame decode would
    need Python."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.octet_length(F.col(payload_col)) - 1) / every_n_bytes, F.lit(0)
                ).cast("int"),
            )
        ).alias("frame_index", "byte_offset_step"),
    ).select(
        id_col,
        "frame_index",
        (F.col("frame_index") * every_n_bytes).alias("byte_offset"),
    )
