"""Watermark LATE-DATA semantics pinned end-to-end (§2.10),
EMPIRICALLY — Spark runs a TWO-watermark model per micro-batch
(the multi-stateful-operator design): the late-record filter uses the
watermark that was in effect during the PREVIOUS batch, while state
EVICTION (append-mode window sealing) uses the current one. The
practical consequence, which these tests pin:

- one-batch GRACE: a row arriving one batch after the watermark
  jumped keeps folding into its window if that window's end exceeds
  the PREVIOUS batch's watermark — even though the current eviction
  watermark is far past it. The window then seals in the same batch
  WITH the late row included, emitted exactly once.
- genuine DROP: once a batch has run with the filter watermark past
  the window's end (i.e. the jump happened two or more batches before
  the late row), the late row is dropped (numRowsDroppedByWatermark),
  the sealed window is NOT re-emitted, and its count is unchanged.

The repo's streaming suites pin stream==batch equivalence on in-order
feeds; these are the complementary pins on genuinely late data — the
behavior the watermark exists to bound state with. Windows are
epoch-aligned: BASE is chosen divisible by 60s because F.window
tumbles from the 1970 epoch, not from the data's min (this suite's
first run caught exactly that 20s skew)."""

from __future__ import annotations

from conftest import EVENTS_BASE_US, write_events_file

from adi_226_datawarehouse_project_spark.streaming.events_stream import (
    _windowed,
    _with_event_time,
    read_events_stream,
)

BASE_US = EVENTS_BASE_US  # divisible by 60s — epoch-aligned windows


def _write_events(dir_path: str, name: str, seconds: list[int], mtime: int) -> None:
    write_events_file(
        dir_path, name, [(i, s, 1, "view") for i, s in enumerate(seconds)], mtime
    )


def _run(spark, sf_dir: str, query_name: str):
    stream = read_events_stream(spark, sf_dir, maxFilesPerTrigger="1")
    agg = _windowed(
        _with_event_time(stream).withWatermark("event_time", "1 minute"),
        "1 minute",
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            p["stateOperators"][0]["numRowsDroppedByWatermark"]
            for p in q.recentProgress
            if p["stateOperators"]
        )
    finally:
        q.stop()
    base_s = BASE_US // 1_000_000
    rows = spark.sql(
        f"SELECT unix_seconds(window_start) AS ws, n_events FROM {query_name}"
    ).collect()
    return sorted((int(r["ws"]) - base_s, int(r["n_events"])) for r in rows), dropped


def test_one_batch_grace_folds_late_row_before_sealing(spark, tmp_path):
    """Batches: [10,70,100] → [500] → LATE [30] → [610]. The watermark
    jumps to 440s at the end of the t=500 batch, but the late batch's
    FILTER watermark is still the previous 40s — window [0,60) (end 60
    > 40) therefore absorbs t=30, and eviction (which does use 440s)
    seals it in the same batch with count 2, emitted exactly once.
    Nothing is counted as dropped."""
    ev_dir = tmp_path / "events.parquet"
    ev_dir.mkdir()
    _write_events(str(ev_dir), "a.parquet", [10, 70, 100], mtime=1_000_000)
    _write_events(str(ev_dir), "b.parquet", [500], mtime=2_000_000)
    _write_events(str(ev_dir), "c-late.parquet", [30], mtime=3_000_000)
    _write_events(str(ev_dir), "d.parquet", [610], mtime=4_000_000)
    got, dropped = _run(spark, str(tmp_path), "late_grace_out")
    assert got == [(0, 2), (60, 2), (480, 1)], got
    assert dropped == 0


def test_late_row_dropped_once_window_sealed(spark, tmp_path):
    """Same shape with one extra advancing batch (t=520) BETWEEN the
    watermark jump and the late row: by the late batch, the filter
    watermark has been 440s for a full batch, windows [0,60)/[60,120)
    are sealed and emitted (counts 1 and 2), and the late t=30 row is
    DROPPED — counted by numRowsDroppedByWatermark, no re-emission, no
    count bump. t=500+520 share [480,540), sealed by t=610's 550s
    watermark; t=610's own window never seals."""
    ev_dir = tmp_path / "events.parquet"
    ev_dir.mkdir()
    _write_events(str(ev_dir), "a.parquet", [10, 70, 100], mtime=1_000_000)
    _write_events(str(ev_dir), "b.parquet", [500], mtime=2_000_000)
    _write_events(str(ev_dir), "b2.parquet", [520], mtime=3_000_000)
    _write_events(str(ev_dir), "c-late.parquet", [30], mtime=4_000_000)
    _write_events(str(ev_dir), "d.parquet", [610], mtime=5_000_000)
    got, dropped = _run(spark, str(tmp_path), "late_drop_out")
    assert got == [(0, 1), (60, 2), (480, 2)], got
    assert dropped == 1
