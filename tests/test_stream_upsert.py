"""Streaming foreachBatch incremental-upsert sink: replaying the whole
source with a fresh checkpoint (at-least-once re-delivery) must add
zero rows, and the final target must equal the batch source exactly —
the streaming form of the reference's NOT EXISTS warehouse loads
(`nyc_hybrid_etl_pipeline.py:98-101,141-223`)."""

import shutil

from conftest import SF_SMALL

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.streaming.upsert_sink import (
    stream_upsert_events,
)

BASE = "/tmp/spark_graft_io/test_stream_upsert"


def test_stream_upsert_idempotent_under_replay(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    target = f"{BASE}/events_latest"

    stream_upsert_events(spark, SF_SMALL, target, f"{BASE}/cp1")
    n_source = load_table(spark, SF_SMALL, "events").count()
    n_after_first = spark.read.parquet(target).count()
    assert n_after_first == n_source

    # Full re-delivery: fresh checkpoint ⇒ every file reprocessed.
    stream_upsert_events(spark, SF_SMALL, target, f"{BASE}/cp2")
    got = spark.read.parquet(target)
    assert got.count() == n_source

    # Exact content equality with the batch source.
    src = load_table(spark, SF_SMALL, "events")
    assert sorted(map(tuple, got.select(*src.columns).collect())) == sorted(
        map(tuple, src.collect())
    )
