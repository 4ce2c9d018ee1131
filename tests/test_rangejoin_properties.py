"""Property tests: range_join (inner AND left) against a pure-Python
interval-containment reference over random point/interval sets —
negative domains, zero-length and inverted intervals, arbitrary bucket
widths, and a shared column name between the two inputs (the r12
qualified-predicate fix: an unqualified predicate mis-resolves when
the interval side carries the point column's name)."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from adi_226_datawarehouse_project_spark.operators.rangejoin import range_join

coord = st.integers(min_value=-50, max_value=50)
interval = st.tuples(coord, st.integers(min_value=-3, max_value=20))


def _ref(points: list[int], intervals: list[tuple[int, int]]):
    """{(pid, iid)} with lo <= p <= hi; inverted (hi < lo) matches none."""
    return {
        (pi, ii)
        for pi, p in enumerate(points)
        for ii, (lo, length) in enumerate(intervals)
        if lo <= p <= lo + length
    }


@settings(max_examples=12, deadline=None)
@given(
    points=st.lists(coord, min_size=0, max_size=25),
    intervals=st.lists(interval, min_size=0, max_size=10),
    width=st.sampled_from([1.0, 3.0, 7.5, 40.0]),
)
def test_range_join_matches_python_reference(spark, points, intervals, width):
    pdf = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)] or [],
        "pid INT, p DOUBLE",
    )
    idf = spark.createDataFrame(
        [(i, float(lo), float(lo + ln)) for i, (lo, ln) in enumerate(intervals)] or [],
        "iid INT, lo DOUBLE, hi DOUBLE",
    )
    want = _ref(points, intervals)
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pdf, "p", idf, "lo", "hi", bucket_width=width).collect()
    }
    assert got == want
    left = range_join(pdf, "p", idf, "lo", "hi", bucket_width=width, how="left").collect()
    matched_pids = {pi for pi, _ in want}
    got_pairs = {(r["pid"], r["iid"]) for r in left if r["iid"] is not None}
    got_unmatched = {r["pid"] for r in left if r["iid"] is None}
    assert got_pairs == want
    assert got_unmatched == set(range(len(points))) - matched_pids
    # every point appears: once per match, or exactly once null-extended
    assert len(left) == len(want) + len(got_unmatched)


def test_range_join_predicate_survives_shared_column_names(spark):
    """Intervals that CARRY the point column's name (and vice versa):
    the r12 fix qualifies p/lo/hi through the internal aliases, so the
    condition resolves against the correct side instead of failing or
    silently matching the wrong column."""
    from pyspark.sql import functions as F

    pdf = spark.createDataFrame(
        [(1, 10.0, -999.0), (2, 30.0, -999.0)], "pid INT, p DOUBLE, lo DOUBLE"
    )
    # interval side carries a decoy `p` column that would match nothing
    idf = spark.createDataFrame(
        [(7, 5.0, 15.0, 10.0)], "iid INT, lo DOUBLE, hi DOUBLE, p DOUBLE"
    )
    rows = range_join(
        pdf.select("pid", "p"), "p",
        idf.select("iid", "lo", "hi", F.col("p").alias("p")), "lo", "hi",
        bucket_width=5.0,
    ).collect()
    assert [(r["pid"], r["iid"]) for r in rows] == [(1, 7)]
