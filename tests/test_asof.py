"""As-of join semantics: backward match, exact-tie inclusion, per-key
isolation, and no-match NULLs (`operators/asof.py`)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_backward_tie_and_null(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "a", _ts(5)), (3, "a", _ts(4)), (5, "a", _ts(2)), (4, "b", _ts(10))],
        "id INT, k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        # a@5 ties left id=2 exactly; a@7 is the latest ≤ 10; b has none ≤ 10 except @11 (after)
        [(100, "a", _ts(3)), (101, "a", _ts(5)), (102, "a", _ts(7)), (103, "b", _ts(11))],
        "rid INT, k STRING, ts TIMESTAMP",
    )
    out = {
        r["id"]: (r["asof_rid"], r["asof_ts"])
        for r in asof_join(left, right, by=["k"], ts="ts", right_value_cols=["rid"]).collect()
    }
    assert out[1] == (102, _ts(7))  # latest prior
    assert out[2] == (101, _ts(5))  # exact tie matches (backward-inclusive)
    assert out[3] == (100, _ts(3))
    assert out[5] == (None, None)  # no right row at or before ts=2
    assert out[4] == (None, None)  # right row exists but only in the future


def test_asof_matches_range_join_dedup(spark):
    """Equivalence vs the naive range-join + argmax formulation on a
    random-ish grid (the formulation the window version replaces)."""
    left = spark.range(200).select(
        F.col("id").alias("lid"),
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 13 % 997).alias("ts"),
    )
    right = spark.range(150).select(
        F.col("id").alias("rid"),
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 37 % 997).alias("ts"),
    )
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(left, right, by=["k"], ts="ts", right_value_cols=["rid"]).collect()
    }
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k")) & (F.col("l.ts") >= F.col("r.ts")),
            "left",
        )
        .groupBy("l.lid")
        .agg(F.max_by("r.rid", F.struct("r.ts", "r.rid")).alias("rid"))
    )
    want = {r["lid"]: r["rid"] for r in naive.collect()}
    assert got == want
