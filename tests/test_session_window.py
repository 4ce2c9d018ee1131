"""Native session_window sessionization: per-user session counts must
match the SQL lag/cumsum formulation on the fixtures (batch), and the
streaming form must match the batch form exactly (multi-micro-batch,
watermarked)."""

from conftest import SF_SMALL
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.streaming.events_stream import (
    _with_event_time,
    read_events_stream,
    session_window_counts,
)


def _batch_events(spark):
    return _with_event_time(load_table(spark, SF_SMALL, "events"))


def test_session_window_matches_lag_cumsum_sql(spark):
    ev = _batch_events(spark)
    native = session_window_counts(ev, "30 minutes")
    per_user_native = {
        r["user_id"]: r["n"]
        for r in native.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    ev.createOrReplaceTempView("sw_events")
    per_user_sql = {
        r["user_id"]: r["n_sessions"]
        for r in spark.sql("""
            SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions
            FROM (
              SELECT user_id,
                     CASE WHEN lag_ts IS NULL
                               OR unix_micros(event_time) - unix_micros(lag_ts) > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM (
                SELECT user_id, event_time,
                       lag(event_time) OVER (PARTITION BY user_id
                                             ORDER BY event_time, event_id) AS lag_ts
                FROM sw_events) x) g
            GROUP BY user_id
        """).collect()
    }
    assert per_user_native == per_user_sql
    # session event counts conserve the table
    total = native.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()
    # windows are genuinely merged: every session spans < gap between
    # consecutive events, so (end - start) >= gap means >= 2 events or
    # exactly the gap padding for singletons
    bad = native.filter(
        (F.col("n_events") == 1)
        & (
            F.unix_micros("session_end") - F.unix_micros("session_start")
            != 1800 * 1000000
        )
    ).count()
    assert bad == 0  # a singleton session's window is exactly the gap


def test_streaming_session_window_equals_batch(spark):
    stream = read_events_stream(spark, SF_SMALL, maxFilesPerTrigger="1")
    agg = session_window_counts(
        _with_event_time(stream).withWatermark("event_time", "2 hours"),
        "30 minutes",
    )
    name = "sw_stream_out"
    q = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_window_counts(_batch_events(spark), "30 minutes").collect()
    }
    assert got == want and len(want) > 0
