"""Stream-static enrichment join — the streaming form of the star
schema's fact⋈dim lookups: a live event stream joined against a
static (or slowly-refreshed) dimension snapshot. Spark re-resolves
the STATIC side per micro-batch, so a dimension parquet directory
that is rewritten between batches (e.g. by the CDC sink's
write-new-then-swap) is picked up on the next trigger without
touching the streaming graph — the cheap half of a stream-stream
join whenever one side changes slowly.

Scale posture: the static side rides the normal join planning —
broadcast when small (the dim case), shuffle otherwise; the stream
side's state is ZERO for this join kind (no watermark bookkeeping —
unmatched rows resolve within their own micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming frame with a static dimension. ``how`` is
    limited to inner/left_outer/left_semi/left_anti — the kinds Spark
    supports with the stream on the left against a static right."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(f"stream-static join kind not supported: {how!r}")
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on, how)
