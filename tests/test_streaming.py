"""Structured Streaming proof: the streaming query over the events
parquet source must produce exactly the batch result of the same
transformation (stream-batch equivalence, Structured Streaming's core
guarantee)."""

from conftest import SF_SMALL

from adi_226_datawarehouse_project_spark.streaming.events_stream import (
    run_windowed_counts_once,
    windowed_event_counts,
)


def _normalize(df):
    return sorted(
        (r["window_start"], r["event_type"], r["n_events"]) for r in df.collect()
    )


def test_stream_matches_batch(spark):
    batch = windowed_event_counts(spark, SF_SMALL, "5 minutes")
    stream = run_windowed_counts_once(spark, SF_SMALL, "5 minutes")
    got_b = _normalize(batch)
    got_s = _normalize(stream)
    assert len(got_b) > 0
    assert got_s == got_b
