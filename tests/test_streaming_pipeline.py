"""End-to-end exactly-once streaming pipeline (source → session
windows → CDC snapshot): kill-and-resume across the publish/commit
crash window, batch-oracle equality, and the SODA-source chain.
See pipelines/streaming_pipeline.py for the exactly-once argument."""

import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.pipelines.streaming_pipeline import (
    batch_session_oracle,
    file_events_stream,
    read_sessions_snapshot,
    run_sessions_to_cdc,
    soda_events_stream,
)

BASE = "/tmp/spark_graft_io/test_streaming_pipeline"
GAP, WM = "30 minutes", "10 minutes"
SENTINEL_USER = 999_999


def _event_rows(n_users: int = 6, per_user: int = 30):
    """Deterministic multi-session event history: per user, bursts of
    5-minute-spaced events separated by >30min gaps every 10 events."""
    rows = []
    eid = 0
    for u in range(1, n_users + 1):
        t = 1_700_000_000 + u * 97  # distinct phase per user
        for i in range(per_user):
            t += 300 if i % 10 else 3600 + 300  # new session every 10
            rows.append((eid, u, t))
            eid += 1
    return rows


def _ts(epoch: int) -> str:
    return time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(epoch))


def _write_event_files(spark, path: str, rows, n_files: int = 4):
    """Events as n_files parquet files + two trailing sentinel files
    (far-future single events) so the watermark finalizes every real
    session: sentinel 1 advances the watermark past all real events;
    sentinel 2 triggers the batch in which they emit. mtimes ascend so
    maxFilesPerTrigger=1 consumes them in order."""
    os.makedirs(path)
    # contiguous TIME slices, not round-robin: the stream must be
    # roughly time-ordered or the watermark (global max - delay) would
    # finalize sessions before their remaining events arrive
    ordered = sorted(rows, key=lambda r: r[2])
    k = (len(ordered) + n_files - 1) // n_files
    chunks = [ordered[i * k : (i + 1) * k] for i in range(n_files)]
    files = []
    for i, chunk in enumerate(chunks):
        df = spark.createDataFrame(
            [(e, _ts(t), u, "click", 1.0, "{}") for (e, u, t) in chunk],
            "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
        ).select(
            "event_id", F.to_timestamp("ts").alias("ts"), "user_id",
            "event_type", "value", "props",
        )
        f = os.path.join(path, f"part-{i:03d}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f + ".dir")
        part = [p for p in os.listdir(f + ".dir") if p.endswith(".parquet")][0]
        shutil.move(os.path.join(f + ".dir", part), f)
        shutil.rmtree(f + ".dir")
        files.append(f)
    far = max(t for (_, _, t) in rows)
    for j, bump in enumerate((30 * 86400, 31 * 86400)):
        df = spark.createDataFrame(
            [(10_000_000 + j, _ts(far + bump), SENTINEL_USER + j, "flush", 0.0, "{}")],
            "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
        ).select(
            "event_id", F.to_timestamp("ts").alias("ts"), "user_id",
            "event_type", "value", "props",
        )
        f = os.path.join(path, f"part-9{j}0-sentinel.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f + ".dir")
        part = [p for p in os.listdir(f + ".dir") if p.endswith(".parquet")][0]
        shutil.move(os.path.join(f + ".dir", part), f)
        shutil.rmtree(f + ".dir")
        files.append(f)
    now = time.time() - len(files)
    for k, f in enumerate(files):
        os.utime(f, (now + k, now + k))
    return files


def _oracle(spark, rows):
    events = spark.createDataFrame(
        [(e, u, _ts(t)) for (e, u, t) in rows],
        "event_id bigint, user_id bigint, ts string",
    ).select("event_id", "user_id", F.to_timestamp("ts").alias("event_time"))
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch_session_oracle(events, GAP).collect()
    }


def _snapshot_set(spark, target):
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in read_sessions_snapshot(spark, target)
        .filter(F.col("user_id") < SENTINEL_USER)
        .collect()
    }


def test_kill_and_resume_exactly_once(spark):
    """Crash injected AFTER a CDC publish, BEFORE the epoch commits —
    the window where a non-idempotent sink double-applies. Restart on
    the same checkpoint must re-fold the replayed epoch to the same
    value and finish: final snapshot == batch oracle, row for row."""
    base = os.path.join(BASE, "kill_resume")
    shutil.rmtree(base, ignore_errors=True)
    events_path = os.path.join(base, "events")
    target = os.path.join(base, "sessions_cdc")
    ckpt = os.path.join(base, "ckpt")
    rows = _event_rows()
    _write_event_files(spark, events_path, rows)

    def stream():
        return (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(events_path)
            .select("event_id", "user_id", F.col("ts").alias("event_time"))
        )

    with pytest.raises(Exception, match="injected crash"):
        run_sessions_to_cdc(
            spark, stream(), target, ckpt, gap=GAP, watermark=WM,
            fault_after_publish_epoch=2,
        )
    # resume on the SAME checkpoint, no fault — drains to the end
    run_sessions_to_cdc(spark, stream(), target, ckpt, gap=GAP, watermark=WM)
    want = _oracle(spark, rows)
    assert _snapshot_set(spark, target) == want and len(want) >= 18

    # a third run with no new data must be a no-op (replay idempotence)
    run_sessions_to_cdc(spark, stream(), target, ckpt, gap=GAP, watermark=WM)
    assert _snapshot_set(spark, target) == want


def test_soda_source_end_to_end(spark):
    """The same chain fed by the SODA streaming source over recorded
    pages (one micro-batch per page): snapshot == batch oracle."""
    base = os.path.join(BASE, "soda")
    shutil.rmtree(base, ignore_errors=True)
    pages_dir = os.path.join(base, "pages")
    target = os.path.join(base, "sessions_cdc")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(pages_dir)
    rows = _event_rows(n_users=4, per_user=20)
    far = max(t for (_, _, t) in rows)
    # time-ordered pages (append-only endpoints serve in row order; an
    # out-of-order feed would watermark-drop late users — same note as
    # the file fixture)
    payload = [(e, u, _ts(t)) for (e, u, t) in sorted(rows, key=lambda r: r[2])] + [
        (10_000_000, SENTINEL_USER, _ts(far + 30 * 86400)),
        (10_000_001, SENTINEL_USER + 1, _ts(far + 31 * 86400)),
    ]
    page = 41  # divides len(payload): full pages only (replay contract)
    assert len(payload) % page == 0
    for off in range(0, len(payload) + page, page):
        recs = [
            {"event_id": str(e), "user_id": str(u), "ts": ts}
            for (e, u, ts) in payload[off : off + page]
        ]
        with open(os.path.join(pages_dir, f"page_{off}_{page}.json"), "w") as f:
            json.dump(recs, f)

    events = soda_events_stream(
        spark, f"file://{pages_dir}/page_{{offset}}_{{limit}}.json", page
    )
    run_sessions_to_cdc(
        spark, events, target, ckpt, gap=GAP, watermark=WM,
        processing_time="200 milliseconds", idle_timeout=90.0,
    )
    assert _snapshot_set(spark, target) == _oracle(spark, rows)


def test_interval_seconds_parser_and_grace_derivation():
    """The quiesce grace must span multiple trigger intervals — a fixed
    4s grace with processing_time='10 seconds' could observe idle
    BETWEEN triggers and truncate the snapshot. Pin the parser and the
    max(4, 3x) derivation."""
    from adi_226_datawarehouse_project_spark.pipelines.streaming_pipeline import (
        _interval_seconds,
    )

    assert _interval_seconds("200 milliseconds") == pytest.approx(0.2)
    assert _interval_seconds("1 second") == 1.0
    assert _interval_seconds("10 seconds") == 10.0
    assert _interval_seconds("2 minutes") == 120.0
    assert _interval_seconds("1 hour") == 3600.0
    assert _interval_seconds("500 microseconds") == pytest.approx(5e-4)
    with pytest.raises(ValueError, match="unparseable"):
        _interval_seconds("10 fortnights")
    with pytest.raises(ValueError, match="unparseable"):
        _interval_seconds("")
    # Abbreviations Spark's trigger itself REJECTS must raise here too
    # (Trigger.ProcessingTime throws INVALID_INTERVAL_FORMAT on all of
    # these in PySpark 4.1.2); the old table quietly accepted them —
    # and parsed '2 m' as milliseconds.
    for bad in ("200 ms", "30 s", "5 min", "2 m"):
        with pytest.raises(ValueError, match="unparseable"):
            _interval_seconds(bad)
    # derived grace: floor 4s at sub-second triggers, 3x above it
    assert max(4.0, 3.0 * _interval_seconds("200 milliseconds")) == 4.0
    assert max(4.0, 3.0 * _interval_seconds("10 seconds")) == 30.0


def test_grace_exceeding_idle_timeout_is_a_loud_config_error(spark, tmp_path):
    """grace = 3x trigger; if that already exceeds idle_timeout the
    quiesce wait could only ever end in TimeoutError — reject the
    configuration up front instead."""
    src = str(tmp_path / "src")
    spark.sql(
        "SELECT CAST(1 AS bigint) event_id, CAST(1 AS bigint) user_id, "
        "TIMESTAMP '2024-01-01' event_time"
    ).write.parquet(src)
    events = (
        spark.readStream.schema("event_id bigint, user_id bigint, event_time timestamp")
        .parquet(src)
    )
    with pytest.raises(ValueError, match="idle_timeout"):
        run_sessions_to_cdc(
            spark, events, str(tmp_path / "t"), str(tmp_path / "c"),
            gap=GAP, watermark=WM,
            processing_time="10 minutes", idle_timeout=60.0,
        )


def test_default_idle_timeout_scales_with_trigger():
    """The DEFAULT idle_timeout derives from the trigger (max(120,
    12×interval)) so coarse triggers don't trip the grace guard out of
    the box; only an EXPLICIT too-small value raises (previous test)."""
    from adi_226_datawarehouse_project_spark.pipelines.streaming_pipeline import (
        _default_idle_timeout,
        _interval_seconds,
    )

    for trigger, want in [
        ("200 milliseconds", 120.0),  # floor holds at fine triggers
        ("10 seconds", 120.0),
        ("1 minute", 720.0),  # 12× scales past the floor
        ("10 minutes", 7200.0),
    ]:
        derived = _default_idle_timeout(trigger)
        grace = max(4.0, 3.0 * _interval_seconds(trigger))
        assert derived == want
        assert grace < derived  # the guard can never fire on defaults


def test_empty_batches_do_not_publish_generations(spark, tmp_path):
    """Append-mode session windows emit nothing until the watermark
    closes a session, so most early micro-batches are EMPTY — each one
    previously read + rewrote the whole snapshot and flipped a
    generation for zero changes (burning the reader-protection window
    and publishing an empty gen-000000 before any real data). The fold
    must skip them: a run whose batches finalize nothing publishes NO
    generations at all."""
    src = str(tmp_path / "src")
    # One tight burst, no sentinel: the watermark never passes the
    # session end, so every micro-batch output is empty.
    spark.createDataFrame(
        [(i, 1, _ts(1_700_000_000 + i * 60)) for i in range(10)],
        "event_id bigint, user_id bigint, ts string",
    ).select(
        "event_id", "user_id", F.to_timestamp("ts").alias("event_time")
    ).write.parquet(src)
    events = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, event_time timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    target = str(tmp_path / "t")
    run_sessions_to_cdc(
        spark, events, target, str(tmp_path / "c"), gap=GAP, watermark=WM
    )
    published = (
        [d for d in os.listdir(target) if d.startswith("gen-")]
        if os.path.isdir(target)
        else []
    )
    assert published == [], published
