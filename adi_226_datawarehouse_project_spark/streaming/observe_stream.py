"""Streaming telemetry: the streaming half of the engine's write-time
observability (`sources/observe.py` is the batch half). Metrics ride
the micro-batch — ``DataFrame.observe`` on a streaming frame surfaces
per-batch aggregate rows in every ``StreamingQueryProgress`` — so
row-count/freshness telemetry costs zero extra jobs and zero state,
exactly like the batch observations.

What a production operator watches per query (all extracted here):

- per-batch OBSERVED metrics (named, user-defined — e.g. ingest row
  count, min/max event time for freshness lag);
- engine progress: input rows/sec, batch durations;
- STATE size (``stateOperators.numRowsTotal``) — the number that must
  stay bounded under the watermark for a stream to run forever; the
  RocksDB store pinned in session.py keeps it off-heap, this is the
  hook that tells you it is actually bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def observe_stream(df: DataFrame, name: str, *metrics: Column) -> DataFrame:
    """Attach a NAMED observation to a streaming frame (streaming
    observations must be named — the name keys ``observedMetrics`` in
    each progress). Defaults to a row count when no metrics given."""
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("n"),)
    return df.observe(name, *metrics)


def collect_observed(query: StreamingQuery, name: str) -> list[dict]:
    """Per-micro-batch observed metric rows for ``name``, in batch
    order: ``[{"batchId": ..., <metric>: ...}, ...]`` (batches where
    the observation produced no row are skipped)."""
    out = []
    for p in query.recentProgress:
        om = p.get("observedMetrics") or {}
        if name in om:
            row = om[name]
            d = row.asDict() if hasattr(row, "asDict") else dict(row)
            out.append({"batchId": p["batchId"], **d})
    return out


def progress_summary(query: StreamingQuery) -> dict:
    """Roll up ``recentProgress`` into the numbers an operator alarms
    on: batches, total input rows, mean batch duration, peak state
    rows, and the last watermark."""
    progresses = list(query.recentProgress)
    n_input = sum(int(p["numInputRows"]) for p in progresses)
    durations = [
        int(p["durationMs"]["triggerExecution"])
        for p in progresses
        if "triggerExecution" in p.get("durationMs", {})
    ]
    state_peak = 0
    for p in progresses:
        for s in p.get("stateOperators", []):
            state_peak = max(state_peak, int(s.get("numRowsTotal", 0)))
    return {
        "n_batches": len(progresses),
        "input_rows": n_input,
        "mean_batch_ms": (sum(durations) / len(durations)) if durations else 0.0,
        "state_rows_peak": state_peak,
        "last_watermark": (
            progresses[-1].get("eventTime", {}).get("watermark") if progresses else None
        ),
    }
