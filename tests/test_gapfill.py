"""Unit tests for operators/gapfill.py (spine + LOCF + interpolation).

The cross-engine value oracle lives in the declared query
``op_gapfill_interpolate`` (plans/operators_suite.py); these tests pin
the semantics on hand-computed series and the span guard.
"""

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.gapfill import (
    MICROS,
    gap_fill_interpolate,
    hourly_observations,
)


def _obs(spark, rows):
    return spark.createDataFrame(
        [(s, h, int(round(v * MICROS)) * n, n) for (s, h, v, n) in rows],
        "series_id INT, bucket_hour BIGINT, v_units BIGINT, n_obs BIGINT",
    )


def test_hand_series_locf_and_interpolation(spark):
    # series 1: observed 0->2.0, 3->8.0, 4->4.0 ; gaps at 1, 2
    out = gap_fill_interpolate(
        _obs(spark, [(1, 0, 2.0, 1), (1, 3, 8.0, 1), (1, 4, 4.0, 1)])
    ).orderBy("bucket_hour")
    rows = {r.bucket_hour: r for r in out.collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert rows[0].n_obs == 1 and rows[0].v == 2.0
    # gap rows: LOCF carries 2.0; interpolation walks 2.0 -> 8.0
    assert rows[1].n_obs == 0 and rows[1].v is None
    assert rows[1].locf_v == 2.0 and rows[1].interp_v == 4.0
    assert rows[2].locf_v == 2.0 and rows[2].interp_v == 6.0
    # observed rows: all three fills agree with the observation
    for hb in (0, 3, 4):
        assert rows[hb].v == rows[hb].locf_v == rows[hb].interp_v


def test_bucket_average_uses_exact_units(spark):
    # two observations in one bucket: avg (1.25 + 2.75) / 2 = 2.0
    out = gap_fill_interpolate(
        _obs(spark, [(7, 10, 2.0, 2), (7, 12, 5.0, 1)])
    ).orderBy("bucket_hour")
    rows = out.collect()
    assert rows[0].v == 2.0 and rows[0].n_obs == 2
    assert rows[1].n_obs == 0 and rows[1].interp_v == 3.5  # midpoint 2.0->5.0


def test_multiple_series_fill_independently(spark):
    out = gap_fill_interpolate(
        _obs(spark, [(1, 0, 1.0, 1), (1, 2, 3.0, 1), (2, 100, 9.0, 1)])
    )
    got = {(r.series_id, r.bucket_hour) for r in out.collect()}
    assert got == {(1, 0), (1, 1), (1, 2), (2, 100)}


def test_span_guard_raises_on_giant_series(spark):
    df = _obs(spark, [(1, 0, 1.0, 1), (1, 10, 2.0, 1)])
    with pytest.raises(Exception, match="chunk the span upstream"):
        gap_fill_interpolate(df, max_span_slots=5).collect()


def test_hourly_observations_buckets_and_units(spark):
    ev = spark.createDataFrame(
        [(0, "2024-01-01 00:10:00", 1.5), (0, "2024-01-01 00:50:00", 2.5),
         (3, "2024-01-01 02:00:00", 7.0)],
        "user_id INT, ts STRING, value DOUBLE",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    obs = hourly_observations(ev, F.col("user_id")).orderBy("series_id", "bucket_hour")
    rows = obs.collect()
    assert rows[0].v_units == 4 * MICROS and rows[0].n_obs == 2
    assert rows[1].v_units == 7 * MICROS and rows[1].n_obs == 1
    assert rows[1].bucket_hour - rows[0].bucket_hour == 2


def test_no_gaps_left_in_any_spine(spark, sf_dir):
    from adi_226_datawarehouse_project_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    obs = hourly_observations(ev, F.col("user_id") % 16)
    out = gap_fill_interpolate(obs)
    holes = (
        out.groupBy("series_id")
        .agg(
            (F.max("bucket_hour") - F.min("bucket_hour") + 1).alias("span"),
            F.count("*").alias("n"),
            F.sum(F.when(F.col("interp_v").isNull(), 1).otherwise(0)).alias("null_interp"),
            F.sum(F.when(F.col("locf_v").isNull(), 1).otherwise(0)).alias("null_locf"),
        )
        .where(
            (F.col("span") != F.col("n"))
            | (F.col("null_interp") > 0)
            | (F.col("null_locf") > 0)
        )
    )
    assert holes.count() == 0


def test_all_null_value_bucket_is_a_gap_not_an_anchor(spark):
    """A bucket whose events all carry NULL values (v_units NULL,
    n_obs 0) used to anchor the spine while having nothing to fill
    from — leading rows came out with locf_v NULL and interp_v NULL,
    breaking the documented 'locf_v never NULL' contract. It must be
    treated as a gap."""
    from pyspark.sql import functions as F

    from adi_226_datawarehouse_project_spark.operators.gapfill import (
        gap_fill_interpolate,
        hourly_observations,
    )

    h0 = 1_700_000_400  # some epoch second
    events = spark.createDataFrame(
        [
            (1, h0, None),            # all-NULL bucket
            (1, h0 + 2 * 3600, 10.0),
            (1, h0 + 4 * 3600, 20.0),
        ],
        "sid INT, ts BIGINT, value DOUBLE",
    )
    obs = hourly_observations(events, F.col("sid"))
    out = gap_fill_interpolate(obs).orderBy("bucket_hour").collect()
    # Spine starts at the first REAL observation (h0+2h), 3 hourly rows
    assert len(out) == 3
    assert all(r["locf_v"] is not None for r in out), out
    assert all(r["interp_v"] is not None for r in out), out
    assert out[0]["v"] == 10.0 and out[-1]["v"] == 20.0
