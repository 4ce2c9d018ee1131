"""Order-robust streaming sessionization at 64× (r12 streaming review
follow-through): the `sessionize.py` escape-hatch operator documents a
per-key time-ordered micro-batch contract that a multi-file backfill
VIOLATES (every replicated part spans the full time range). The
production path — the built-in `session_window` aggregation — must be
order-robust there: this probe streams the 64× multi-file events table
(one file per micro-batch, i.e. maximally out-of-order batches) through
a watermarked session_window and value-compares per-user session
counts against the batch form.

Run: python scripts/session_window_scale.py [corpus_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.session import get_spark
from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.streaming.events_stream import (
    _with_event_time,
    read_events_stream,
    session_window_counts,
)

GAP = "30 minutes"


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_x64"
    spark = get_spark("session-window-scale")
    ev = _with_event_time(load_table(spark, corpus, "events"))
    n_events = ev.count()

    t0 = time.perf_counter()
    batch = {
        (r["user_id"], r["n"]): None
        for r in session_window_counts(ev, GAP)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    wall_batch = time.perf_counter() - t0

    # The watermark must exceed the replay disorder (parts span the
    # whole month), else late sessions are dropped: 40 days > the
    # fixture's 30-day span, so nothing is ever considered late. A real
    # deployment reading an ordered log uses a small watermark; this IS
    # the backfill configuration.
    stream = _with_event_time(
        read_events_stream(spark, corpus, maxFilesPerTrigger="4")
    ).withWatermark("event_time", "40 days")
    name = "sw_scale_out"
    t0 = time.perf_counter()
    q = (
        session_window_counts(stream, GAP)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [int(p["numInputRows"]) for p in q.recentProgress]
    finally:
        q.stop()
    wall_stream = time.perf_counter() - t0
    streamed = {
        (r["user_id"], r["n"]): None
        for r in spark.sql(
            f"SELECT user_id, CAST(count(1) AS BIGINT) AS n FROM {name} GROUP BY user_id"
        ).collect()
    }
    match = streamed == batch
    print(json.dumps({
        "corpus": corpus,
        "n_events": n_events,
        "n_users": len(batch),
        "stream_equals_batch": match,
        "wall_batch_s": round(wall_batch, 2),
        "wall_stream_s": round(wall_stream, 2),
        "n_microbatches": len(progress),
        "loadavg": os.getloadavg(),
    }))
    assert match, "order-robust session_window diverged from batch at 64x"


if __name__ == "__main__":
    main()
