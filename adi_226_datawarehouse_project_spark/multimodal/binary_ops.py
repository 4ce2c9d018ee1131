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
