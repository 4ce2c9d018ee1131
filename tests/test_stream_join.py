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
