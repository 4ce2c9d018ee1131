"""Declarative staging validation (Deequ-lite): exact violation
counts per constraint kind, all single-pass kinds share ONE
aggregation job, the exact-unique kind adds exactly one grouped job,
and the require() gate raises naming every failure."""

import pytest
from pyspark.sql import Row

from adi_226_datawarehouse_project_spark.functions import quality_checks as QC


@pytest.fixture()
def dirty(spark):
    rows = [
        Row(id="1", lat=40.5, name="a"),
        Row(id="2", lat=40.9, name="b"),
        Row(id="2", lat=41.5, name="c"),   # dup id + out-of-range lat
        Row(id=None, lat=40.6, name="d"),  # null id
        Row(id="x9", lat=None, name="e"),  # regex violation; null lat OK for range
    ]
    return spark.createDataFrame(rows)


def test_violation_counts_exact(spark, dirty):
    report = QC.check(
        dirty,
        [
            QC.non_empty(),
            QC.not_null("id"),
            QC.unique("id"),
            QC.in_range("lat", 40.4, 41.0),
            QC.matches("id", r"^[0-9]+$"),
            QC.in_set("name", ["a", "b", "c", "d"]),
        ],
    )
    got = {r["name"]: (r["violations"], r["passed"]) for r in report}
    assert got["non_empty"] == (0, True)
    assert got["not_null(id)"] == (1, False)
    assert got["unique(id)"] == (1, False)          # one extra row of id=2
    assert got["in_range(lat,[40.4,41.0])"] == (1, False)  # 41.5; NULL not counted
    assert got[r"matches(id,^[0-9]+$)"] == (1, False)      # 'x9'; NULL not counted
    assert got["in_set(name ∈ {'a','b','c','d'})"] == (1, False)  # 'e'
    assert all(r["total"] == 5 for r in report)


def test_empty_frame_fails_non_empty(spark):
    df = spark.createDataFrame([], "id STRING")
    (r,) = QC.check(df, [QC.non_empty()])
    assert (r["violations"], r["passed"], r["total"]) == (1, False, 0)


def test_approx_unique_single_pass_consistency(spark):
    # all-distinct passes; a 30% duplicate mass exceeds the 5% sketch
    # tolerance and fails
    ok = spark.range(1000).withColumnRenamed("id", "k")
    (r,) = QC.check(ok, [QC.approx_unique("k")])
    assert r["passed"]
    import pyspark.sql.functions as F

    dup = ok.union(ok.limit(300)).withColumn("k", F.col("k"))
    (r2,) = QC.check(dup, [QC.approx_unique("k")])
    assert not r2["passed"] and r2["violations"] > 0


def _jobs_run(spark, group, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_single_pass_kinds_cost_one_aggregation(spark, dirty):
    """All single-pass constraints together must cost exactly as many
    jobs as ONE plain aggregation (AQE may stage an agg+collect into
    >1 job, so the gate is relative to that baseline), and each exact
    unique() adds exactly one more aggregation's worth."""
    import pyspark.sql.functions as F

    frame = dirty.localCheckpoint(eager=True)
    baseline = _jobs_run(
        spark, "qc-base", lambda: frame.agg(F.count(F.lit(1))).collect()
    )
    cons = [
        QC.non_empty(),
        QC.not_null("id"),
        QC.in_range("lat", 40.4, 41.0),
        QC.matches("id", r"^[0-9]+$"),
        QC.approx_unique("id"),
    ]
    assert _jobs_run(spark, "qc-single", lambda: QC.check(frame, cons)) == baseline
    assert (
        _jobs_run(
            spark, "qc-unique", lambda: QC.check(frame, cons + [QC.unique("id")])
        )
        <= 2 * baseline + 1
    )


def test_require_raises_with_named_failures(spark, dirty):
    with pytest.raises(ValueError, match=r"not_null\(id\).*1/5"):
        QC.require(dirty, [QC.not_null("id"), QC.non_empty()])
    # all-green returns the report
    report = QC.require(dirty, [QC.non_empty()])
    assert report[0]["passed"]


def test_check_requires_constraints(spark, dirty):
    with pytest.raises(ValueError):
        QC.check(dirty, [])


def test_two_in_set_constraints_on_same_column_stay_distinct(spark):
    """Identically-shaped in_set constraints on one column must each
    report their OWN violation count (results are keyed by position,
    and the name embeds the allowed set)."""
    df = spark.createDataFrame(
        [("QUEENS",), ("BRONX",), ("STATEN ISLAND",)], ["borough"]
    )
    strict = QC.in_set("borough", ["QUEENS"])
    loose = QC.in_set("borough", ["QUEENS", "BRONX", "STATEN ISLAND"])
    report = QC.check(df, [strict, loose])
    assert [r["violations"] for r in report] == [2, 0]
    assert report[0]["name"] != report[1]["name"]


def test_in_set_names_disagree_beyond_shown_prefix(spark):
    """Sets agreeing on their first four values still get distinct
    names via the full-list digest."""
    a = QC.in_set("c", ["a", "b", "c", "d", "e"])
    b = QC.in_set("c", ["a", "b", "c", "d", "f"])
    assert a.name != b.name


def test_in_set_with_none_in_values_still_constrains(spark):
    """A None in the allowed list used to poison isin() into SQL
    three-valued NULL for every non-match — ~NULL stays NULL and the
    violation count silently became 0 (the gate stopped gating)."""
    df = spark.createDataFrame(
        [Row(b="QUEENS"), Row(b="BRONX"), Row(b=None)],
    )
    report = QC.check(df, [QC.in_set("b", ["QUEENS", None])])
    (r,) = report
    assert r["violations"] == 1  # BRONX; NULL exempt via isNotNull guard
