"""Streaming dedup (dropDuplicatesWithinWatermark): stream/batch key
equivalence, including duplicates arriving in later micro-batches."""

from __future__ import annotations

import shutil
from pathlib import Path

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.streaming.dedup_stream import (
    DEDUP_KEYS,
    dedup_events,
    dedup_key_summary,
    run_dedup_stream_once,
)


def _key_set(df):
    return {tuple(r) for r in df.select(*DEDUP_KEYS).collect()}


def test_stream_matches_batch_key_set(spark, sf_dir):
    batch = dedup_events(load_table(spark, sf_dir, "events"))
    streamed = run_dedup_stream_once(spark, sf_dir)
    assert _key_set(streamed) == _key_set(batch)
    # streaming must emit exactly one row per key (no dup survivors)
    assert streamed.count() == len(_key_set(streamed))


def test_cross_microbatch_duplicates_dropped(spark, sf_dir, tmp_path):
    """Replay the same events file as a SECOND micro-batch: every key
    in batch 2 is a duplicate of batch 1 and must be dropped — the
    stateful case a per-batch distinct cannot handle."""
    d = tmp_path / "stream_src"
    d.mkdir()
    src = Path(sf_dir) / "events.parquet"
    shutil.copy(src, d / "events.parquet")
    shutil.copy(src, d / "events_replay.parquet")
    streamed = run_dedup_stream_once(
        spark,
        str(d),
        maxFilesPerTrigger="1",
        pathGlobFilter="*.parquet",
    )
    batch_once = dedup_events(load_table(spark, sf_dir, "events"))
    assert _key_set(streamed) == _key_set(batch_once)
    assert streamed.count() == batch_once.count()


def test_key_summary_is_survivor_invariant(spark, sf_dir):
    """The declared contract (per-type key counts + uid checksum) is
    identical however dropDuplicates breaks per-key ties: compare the
    operator's summary against distinct-keys-only derivation."""
    ev = load_table(spark, sf_dir, "events")
    a = dedup_key_summary(dedup_events(ev)).collect()
    b = dedup_key_summary(ev.select(*DEDUP_KEYS).distinct()).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
