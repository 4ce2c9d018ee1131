"""Stream-stream join: the watermarked streaming click→purchase
attribution join must produce exactly the batch join's summary."""

from conftest import SF_SMALL

from adi_226_datawarehouse_project_spark.streaming.stream_join import (
    clicks_purchases_batch,
    run_stream_stream_join_once,
)


def test_stream_stream_join_matches_batch(spark):
    batch = clicks_purchases_batch(spark, SF_SMALL).collect()[0]
    stream = run_stream_stream_join_once(spark, SF_SMALL).collect()[0]
    assert batch["n_pairs"] > 0
    assert tuple(stream) == tuple(batch)


def _write_events(ev_dir, name, rows, mt):
    """rows: (event_id, sec, user_id, event_type)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_040_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base_us + r[1] * 1_000_000 for r in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([None] * len(rows), pa.string()),
        }
    )
    p = os.path.join(str(ev_dir), name)
    pq.write_table(tbl, p)
    os.utime(p, (mt, mt))


def _left_rows(df):
    base = 1_700_000_040
    return sorted(
        (
            r["user_id"],
            int(r["click_time"].timestamp()) - base,
            None
            if r["purchase_time"] is None
            else int(r["purchase_time"].timestamp()) - base,
        )
        for r in df.collect()
    )


def test_left_outer_stream_join_emits_null_after_horizon(spark, tmp_path):
    """LEFT OUTER stream-stream join (r13 capability): an unmatched
    click's null-extended row is emitted once the watermark proves no
    purchase inside [click, click+10min] can still arrive. Fixture:
    u1 click@0 matches purchase@300; u2 click@60 never matches; tail
    matched pairs at t=5000/5100 drive the watermark (1min delay) far
    past u2's 660s horizon. The final rows equal the batch left join's
    exactly — matched pairs emit on arrival, the null row emits late
    but emits."""
    from adi_226_datawarehouse_project_spark.streaming.stream_join import (
        clicks_purchases_batch_left,
        stream_join_pairs_once,
    )

    ev_dir = tmp_path / "events.parquet"
    ev_dir.mkdir()
    _write_events(
        ev_dir,
        "a.parquet",
        [(0, 0, 1, "click"), (1, 60, 2, "click"), (2, 300, 1, "purchase")],
        1_000_000,
    )
    _write_events(
        ev_dir, "b.parquet", [(3, 5000, 99, "click"), (4, 5000, 99, "purchase")], 2_000_000
    )
    _write_events(
        ev_dir, "c.parquet", [(5, 5100, 98, "click"), (6, 5100, 98, "purchase")], 3_000_000
    )

    got = _left_rows(
        stream_join_pairs_once(
            spark,
            str(tmp_path),
            watermark="1 minute",
            how="leftOuter",
            query_name="left_join_out",
            maxFilesPerTrigger="1",
        )
    )
    want = _left_rows(clicks_purchases_batch_left(spark, str(tmp_path)))
    assert (2, 60, None) in got  # the unmatched click DID emit
    assert got == want, (got, want)


def test_left_outer_null_rows_withheld_until_watermark(spark, tmp_path):
    """The timing half of the contract: WITHOUT the tail events the
    watermark never passes the unmatched click's horizon, so its
    null-extended row is withheld (still sitting in state when the
    finite source drains) — only the matched pair appears. This is the
    append-mode trade-off that makes the state bounded: emitting the
    null row early would be retractable, and stream-stream outer joins
    never retract."""
    from adi_226_datawarehouse_project_spark.streaming.stream_join import (
        stream_join_pairs_once,
    )

    ev_dir = tmp_path / "events.parquet"
    ev_dir.mkdir()
    _write_events(
        ev_dir,
        "a.parquet",
        [(0, 0, 1, "click"), (1, 60, 2, "click"), (2, 300, 1, "purchase")],
        1_000_000,
    )
    got = _left_rows(
        stream_join_pairs_once(
            spark,
            str(tmp_path),
            watermark="1 minute",
            how="leftOuter",
            query_name="left_join_nowm_out",
            maxFilesPerTrigger="1",
        )
    )
    assert got == [(1, 0, 300)], got
