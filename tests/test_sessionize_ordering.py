"""Executable pin of sessionize.py's ORDERING CONTRACT (r12 streaming
review): the applyInPandasWithState escape hatch folds correctly only
when micro-batches arrive per-key time-ordered; on an out-of-order
multi-file source it deterministically under-counts, while the
built-in ``session_window`` path stays equal to batch. This is the
documented contract, pinned so a future edit that silently changes
either side's behavior fails loudly."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.streaming.events_stream import (
    _with_event_time,
    read_events_stream,
    session_window_counts,
)
from adi_226_datawarehouse_project_spark.streaming.sessionize import (
    streaming_sessionize,
)

GAP_S = 1800.0


def _write_events(dir_path: str, name: str, seconds: list[int], mtime: int) -> None:
    base = 1_700_000_000_000_000  # epoch micros
    tbl = pa.table(
        {
            "event_id": pa.array(list(range(len(seconds))), pa.int64()),
            "ts": pa.array(
                [base + s * 1_000_000 for s in seconds],
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array([1] * len(seconds), pa.int64()),
            "event_type": pa.array(["view"] * len(seconds)),
            "value": pa.array([1.0] * len(seconds), pa.float64()),
            "props": pa.array([None] * len(seconds), pa.string()),
        }
    )
    path = os.path.join(dir_path, name)
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def out_of_order_sf(tmp_path):
    """events.parquet as a DIRECTORY of two parts whose micro-batch
    order (file mtime) is NOT time order: batch 1 carries t=0 and
    t=7200, batch 2 carries t=3600. Sorted truth: three sessions at
    gap 1800 (consecutive gaps are both 3600)."""
    ev_dir = tmp_path / "events.parquet"
    ev_dir.mkdir()
    _write_events(str(ev_dir), "a-first.parquet", [0, 7200], mtime=1_000_000)
    _write_events(str(ev_dir), "b-second.parquet", [3600], mtime=2_000_000)
    return str(tmp_path)


def test_escape_hatch_raises_on_backfill(spark, out_of_order_sf):
    """ENFORCED contract (r13): a micro-batch whose min ts precedes the
    carried per-key last_ts fails the streaming query loudly instead of
    silently under-counting. The error message names the contract."""
    with pytest.raises(Exception, match="ordering contract violated"):
        streaming_sessionize(
            spark, out_of_order_sf, gap_seconds=GAP_S, query_name="ooo_strict"
        ).collect()


def test_escape_hatch_allow_disorder_folds_and_counts(spark, out_of_order_sf):
    """Under allow_disorder the fold keeps the documented
    fold-in-arrival-order behavior: 0 → 7200 (new session), then 3600
    with a NEGATIVE gap (same session) — 2 sessions, not the batch-true
    3 — and the violation is COUNTED into the n_disorder state (one
    offending batch). If this starts returning 3, the operator grew
    buffering and the docstring's contract (and this pin) should move."""
    res = streaming_sessionize(
        spark,
        out_of_order_sf,
        gap_seconds=GAP_S,
        query_name="ooo_sessions",
        allow_disorder=True,
    ).collect()
    got = {r["user_id"]: r["n_sessions"] for r in res}
    assert got == {1: 2}
    dis = spark.sql(
        "SELECT user_id, max(n_disorder) AS n_disorder "
        "FROM ooo_sessions GROUP BY user_id"
    ).collect()
    assert {r["user_id"]: r["n_disorder"] for r in dis} == {1: 1}


def test_session_window_is_order_robust(spark, out_of_order_sf):
    """The production path on the SAME adversarial source: per-user
    session count equals the batch truth (3) despite the out-of-order
    micro-batches — the state-store merge handles late-arriving
    windows under the watermark."""
    stream = _with_event_time(
        read_events_stream(spark, out_of_order_sf, maxFilesPerTrigger="1")
    ).withWatermark("event_time", "10 days")
    name = "ooo_session_window"
    q = (
        session_window_counts(stream, "30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) == 3
    assert {r["user_id"] for r in rows} == {1}
    assert sum(r["n_events"] for r in rows) == 3
