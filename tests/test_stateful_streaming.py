"""Custom stateful streaming operator (applyInPandasWithState
sessionization): final per-user session counts must equal the batch
lag-window computation — stateful stream-batch equivalence."""

from conftest import SF_SMALL

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.streaming.sessionize import (
    streaming_sessionize,
)

from pyspark.sql import Window
from pyspark.sql import functions as F


def _batch_sessions(spark):
    ev = load_table(spark, SF_SMALL, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        ev.withColumn("lag_ts", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("lag_ts").isNull()
                | ((F.col("ts").cast("double") - F.col("lag_ts").cast("double")) > 1800),
                1,
            ).otherwise(0),
        )
    )
    return {
        r["user_id"]: r["n"]
        for r in gap.groupBy("user_id").agg(F.sum("is_new").alias("n")).collect()
    }


def test_stateful_sessionize_matches_batch(spark):
    got = {
        r["user_id"]: r["n_sessions"]
        for r in streaming_sessionize(spark, SF_SMALL, gap_seconds=1800.0).collect()
    }
    want = _batch_sessions(spark)
    assert got == want
