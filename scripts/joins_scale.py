"""As-of + range join lanes at 64× (r12 — the two custom join
operators had correctness oracles but no scale row of their own).

- as-of: clicks←views attribution over the replicated events table —
  one window shuffle on user_id; wall + output count recorded.
- range join: per-user first-hour windows × ALL events via the
  bucket-explode equi-join (inner, the registry operating point) —
  plan is checked to contain NO BroadcastNestedLoopJoin (the naive
  BETWEEN formulation's plan) and NO CartesianProduct.

Run: python scripts/joins_scale.py [corpus_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.asof import asof_join
from adi_226_datawarehouse_project_spark.operators.rangejoin import range_join
from adi_226_datawarehouse_project_spark.session import get_spark
from adi_226_datawarehouse_project_spark.sources.catalog import load_table


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_x64"
    spark = get_spark("joins-scale")
    ev = load_table(spark, corpus, "events")
    n_events = ev.count()

    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts",
        F.col("event_id").alias("view_id"), F.col("value").alias("view_value"),
    )
    t0 = time.perf_counter()
    n_asof = asof_join(
        clicks, views, by=["user_id"], ts="ts",
        right_value_cols=["view_id", "view_value"],
    ).count()
    wall_asof = time.perf_counter() - t0

    points = ev.select("event_id", "value", F.unix_micros("ts").alias("p"))
    intervals = (
        ev.groupBy(F.col("user_id").alias("window_user"))
        .agg(F.min(F.unix_micros("ts")).alias("lo"))
        .withColumn("hi", F.col("lo") + F.lit(3_600_000_000))
    )
    rj = range_join(points, "p", intervals, "lo", "hi", bucket_width=600e6)
    plan = rj._jdf.queryExecution().executedPlan().toString()
    bnl = "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    t0 = time.perf_counter()
    n_range = rj.count()
    wall_range = time.perf_counter() - t0

    print(json.dumps({
        "corpus": corpus,
        "n_events": n_events,
        "asof": {"wall_s": round(wall_asof, 2), "n_out": n_asof},
        "range": {"wall_s": round(wall_range, 2), "n_out": n_range,
                  "plan_nested_loop": bnl},
        "loadavg": os.getloadavg(),
    }))
    assert not bnl, "range_join planned as a nested-loop/cartesian join"


if __name__ == "__main__":
    main()
