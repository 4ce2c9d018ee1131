"""Range-join semantics: equivalence vs the naive BETWEEN join,
bucket-boundary inclusion, and no duplicate matches
(`operators/rangejoin.py`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.rangejoin import range_join


def test_range_join_matches_naive_between(spark):
    points = spark.range(300).select(
        F.col("id").alias("pid"), ((F.col("id") * 37) % 1000).cast("double").alias("p")
    )
    intervals = spark.range(40).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 53) % 900).cast("double").alias("lo"),
    ).withColumn("hi", F.col("lo") + 25.0)
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, "p", intervals, "lo", "hi", bucket_width=10.0).collect()
    }
    naive = points.join(
        intervals, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
    )
    want = {(r["pid"], r["iid"]) for r in naive.collect()}
    assert got == want
    assert len(got) > 0


def test_range_join_boundaries_inclusive_no_dups(spark):
    # point exactly on lo, on hi, and on a bucket boundary inside the
    # interval; each must match exactly once.
    points = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 15.0), (4, 9.999), (5, 20.001)],
        "pid INT, p DOUBLE",
    )
    intervals = spark.createDataFrame([(7, 10.0, 20.0)], "iid INT, lo DOUBLE, hi DOUBLE")
    rows = range_join(points, "p", intervals, "lo", "hi", bucket_width=5.0).collect()
    matched = sorted(r["pid"] for r in rows)
    assert matched == [1, 2, 3]
    assert len(rows) == 3  # no bucket-overlap duplicates


def test_left_join_keeps_unmatched_points(spark):
    """The exact predicate lives in the JOIN CONDITION: a left range
    join must keep points covered by no interval (the old post-join
    filter silently turned left into inner)."""
    points = spark.createDataFrame([(1.0,), (25.0,)], "p DOUBLE")
    intervals = spark.createDataFrame([(0.0, 5.0)], "lo DOUBLE, hi DOUBLE")
    rows = range_join(
        points, "p", intervals, "lo", "hi", bucket_width=10.0, how="left"
    ).collect()
    got = sorted((r["p"], r["lo"]) for r in rows)
    assert got == [(1.0, 0.0), (25.0, None)]


def test_rejects_right_and_full_outer(spark):
    import pytest

    points = spark.createDataFrame([(1.0,)], "p DOUBLE")
    intervals = spark.createDataFrame([(0.0, 5.0)], "lo DOUBLE, hi DOUBLE")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="inner/left"):
            range_join(points, "p", intervals, "lo", "hi", 10.0, how=how)


def test_range_join_awkward_column_names(spark):
    """Dots AND embedded backticks in column names must resolve as
    top-level fields (ADVICE r12/r13: quoting + backtick doubling)."""
    points = spark.createDataFrame(
        [(1, 10.0), (2, 99.0)], ["pid", "p.va`l"]
    )
    intervals = spark.createDataFrame(
        [(7, 5.0, 15.0)], ["iid", "lo.b`nd", "hi.b`nd"]
    )
    rows = range_join(
        points, "p.va`l", intervals, "lo.b`nd", "hi.b`nd", bucket_width=5.0
    ).collect()
    assert sorted(r["pid"] for r in rows) == [1]
