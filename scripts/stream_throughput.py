"""Streaming throughput probe: drive the watermarked 5-minute windowed
event aggregation (RocksDB state store) over an events parquet dir to
completion and report wall seconds, rows/s, and the PEAK STATE ROWS —
the number that must stay bounded as input grows (the watermark bounds
state by event-time span, not input volume; previous rounds measured
state rows IDENTICAL at 1× and 16× input).

Usage: python scripts/stream_throughput.py [sf_dir ...]
One JSON line per sf_dir.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from adi_226_datawarehouse_project_spark.session import get_spark  # noqa: E402
from adi_226_datawarehouse_project_spark.streaming.events_stream import (  # noqa: E402
    _windowed,
    _with_event_time,
    read_events_stream,
)
from adi_226_datawarehouse_project_spark.streaming.observe_stream import (  # noqa: E402
    progress_summary,
)


def measure(spark, sf_dir: str) -> dict:
    stream = read_events_stream(spark, sf_dir)
    agg = _windowed(
        _with_event_time(stream).withWatermark("event_time", "10 minutes"),
        "5 minutes",
    )
    name = f"stream_tp_{abs(hash(sf_dir)) % 10**6}"
    t0 = time.time()
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        wall = time.time() - t0
        s = progress_summary(q)
    finally:
        q.stop()
    rows = s["input_rows"]
    return {
        "sf_dir": sf_dir,
        "wall_sec": round(wall, 2),
        "input_rows": rows,
        "rows_per_sec": int(rows / wall) if wall > 0 else None,
        "n_batches": s["n_batches"],
        "state_rows_peak": s["state_rows_peak"],
    }


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("stream_throughput")
    for d in dirs:
        print(json.dumps(measure(spark, d)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
