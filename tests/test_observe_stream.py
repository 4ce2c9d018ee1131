"""Streaming telemetry: named observations ride every micro-batch
(exact ingest counts + freshness bounds across multi-batch runs), and
the progress rollup reports bounded state."""

from conftest import SF_SMALL
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.streaming.events_stream import (
    _windowed,
    _with_event_time,
    read_events_stream,
)
from adi_226_datawarehouse_project_spark.streaming.observe_stream import (
    collect_observed,
    observe_stream,
    progress_summary,
)


def test_observed_ingest_counts_cover_every_micro_batch(spark):
    stream = read_events_stream(spark, SF_SMALL, maxFilesPerTrigger="1")
    obs = observe_stream(
        _with_event_time(stream),
        "ingest",
        F.count(F.lit(1)).alias("n"),
        F.max("event_time").alias("max_t"),
    )
    agg = _windowed(obs.withWatermark("event_time", "10 minutes"), "5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("obs_stream_t")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batches = collect_observed(q, "ingest")
    assert batches, "no observed metrics surfaced"
    events = load_table(spark, SF_SMALL, "events")
    # micro-batch counts partition the full table exactly
    assert sum(b["n"] for b in batches) == events.count()
    # freshness bound: the max observed event time equals the batch max
    want_max = events.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    got_max = max(str(b["max_t"]) for b in batches)
    # progress JSON renders timestamps at second precision
    assert str(want_max)[:19] == got_max[:19]

    s = progress_summary(q)
    assert s["input_rows"] == events.count()
    assert s["n_batches"] == len(q.recentProgress)
    assert s["state_rows_peak"] > 0  # the windowed agg holds state
    assert s["mean_batch_ms"] > 0
