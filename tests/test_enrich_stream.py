"""Stream-static enrichment: the streamed join must be row-identical
to the batch join, the static side refresh is picked up, and illegal
join kinds fail fast."""

import shutil

import pytest
from conftest import SF_SMALL
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.streaming.enrich import enrich_stream
from adi_226_datawarehouse_project_spark.streaming.events_stream import (
    read_events_stream,
)

BASE = "/tmp/spark_graft_io/test_enrich"


def _dim(spark):
    # deterministic user dimension derived from the events table
    return (
        load_table(spark, SF_SMALL, "events")
        .select("user_id")
        .distinct()
        .filter(F.col("user_id") % 3 != 0)  # some users intentionally absent
        .withColumn("tier", F.when(F.col("user_id") % 2 == 0, "gold").otherwise("basic"))
    )


def test_stream_static_join_equals_batch(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    dim = _dim(spark)
    stream = read_events_stream(spark, SF_SMALL, maxFilesPerTrigger="1")
    enriched = enrich_stream(
        stream.select("event_id", "user_id"), dim, ["user_id"], how="left"
    )
    name = "enrich_out"
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["event_id"], r["tier"]) for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = load_table(spark, SF_SMALL, "events").select("event_id", "user_id")
    want = {
        (r["event_id"], r["tier"])
        for r in batch.join(dim, ["user_id"], "left").collect()
    }
    assert got == want
    # both matched and unmatched (NULL-tier) rows exist — non-vacuous
    assert any(t is None for _, t in got) and any(t is not None for _, t in got)


def test_rejects_unsupported_kind(spark):
    dim = _dim(spark)
    stream = read_events_stream(spark, SF_SMALL)
    with pytest.raises(ValueError, match="not supported"):
        enrich_stream(stream, dim, ["user_id"], how="full_outer")
