"""Stored HLL sketches: build-per-grain → parquet roundtrip → merge
to coarser grains; estimates within the lg_k error envelope of exact
distinct counts at several cardinalities; late-data re-merge
composes."""

import shutil

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.sketches import (
    build_sketches,
    estimate_per_group,
    merge_sketches,
)

BASE = "/tmp/spark_graft_io/test_sketches"
TOL = 0.05  # 3 sigma at lg_k=12 is ~4.9%


def _events(spark, n=60000, days=6, users=2000):
    return (
        spark.range(n)
        .withColumn("day", (F.col("id") % days).cast("int"))
        .withColumn("user", F.xxhash64("id") % users)
    )


def test_sketches_roundtrip_parquet_and_merge(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    ev = _events(spark)
    build_sketches(ev, ["day"], "user").write.parquet(f"{BASE}/daily")
    daily = spark.read.parquet(f"{BASE}/daily")

    # per-day estimates vs exact
    exact_per_day = {
        r["day"]: r["d"]
        for r in ev.groupBy("day").agg(F.countDistinct("user").alias("d")).collect()
    }
    for r in estimate_per_group(daily).collect():
        want = exact_per_day[r["day"]]
        assert abs(r["distinct_estimate"] - want) <= max(3, TOL * want)

    # merged over all days vs exact global
    (m,) = merge_sketches(daily).collect()
    total_exact = ev.agg(F.countDistinct("user")).collect()[0][0]
    assert abs(m["distinct_estimate"] - total_exact) <= max(3, TOL * total_exact)
    assert m["n_rows"] == ev.count()

    # merged to a coarser grain (weekend-ish split)
    coarse = merge_sketches(
        daily.withColumn("half", (F.col("day") % 2).cast("int")), ["half"]
    )
    for r in coarse.collect():
        want = (
            ev.filter(F.col("day") % 2 == r["half"])
            .agg(F.countDistinct("user"))
            .collect()[0][0]
        )
        assert abs(r["distinct_estimate"] - want) <= max(3, TOL * want)


def test_late_data_re_merge_composes(spark):
    ev = _events(spark, n=30000)
    on_time = ev.filter(F.col("id") % 10 != 0)
    late = ev.filter(F.col("id") % 10 == 0)
    d1 = build_sketches(on_time, ["day"], "user")
    d2 = build_sketches(late, ["day"], "user")
    # re-merge the grain from both deliveries == sketch of all rows
    remerged = merge_sketches(d1.unionByName(d2), ["day"])
    want = {
        r["day"]: r["d"]
        for r in ev.groupBy("day").agg(F.countDistinct("user").alias("d")).collect()
    }
    for r in remerged.collect():
        assert abs(r["distinct_estimate"] - want[r["day"]]) <= max(
            3, TOL * want[r["day"]]
        )


@pytest.mark.parametrize("card", [10, 1000, 50000])
def test_error_envelope_across_cardinalities(spark, card):
    df = spark.range(200000).withColumn("v", F.xxhash64("id") % card)
    sk = build_sketches(df.withColumn("g", F.lit(1)), ["g"], "v")
    (r,) = estimate_per_group(sk).collect()
    exact = df.agg(F.countDistinct("v")).collect()[0][0]
    assert abs(r["distinct_estimate"] - exact) <= max(3, TOL * exact)


def test_heavy_hitters_zipf(spark):
    from adi_226_datawarehouse_project_spark.operators.sketches import heavy_hitters

    # Zipf-ish: value v appears ~N/(v+1) times over a 5000-value domain
    df = spark.range(300000).withColumn(
        "v", F.floor(300000 / (F.col("id") % 300000 + 1)) % 5000
    )
    exact = {
        r["v"]: r["c"]
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    top_exact = sorted(exact.items(), key=lambda kv: -kv[1])[:5]
    got = heavy_hitters(df, "v", k=5).collect()
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    got_items = {r["item"]: r["est_count"] for r in got}
    # the true top-5 are all found, counts within 2%
    for item, c in top_exact:
        assert item in got_items
        assert abs(got_items[item] - c) <= max(2, 0.02 * c)


def test_heavy_hitters_exact_when_domain_fits(spark):
    from adi_226_datawarehouse_project_spark.operators.sketches import heavy_hitters

    df = spark.range(10000).withColumn("v", F.col("id") % 20)
    got = {(r["item"], r["est_count"]) for r in heavy_hitters(df, "v", k=3).collect()}
    assert all(c == 500 for _, c in got) and len(got) == 3


def test_heavy_hitters_per_group(spark):
    from adi_226_datawarehouse_project_spark.operators.sketches import heavy_hitters

    df = spark.range(9000).withColumn("g", (F.col("id") % 3).cast("int")).withColumn(
        "v", F.when(F.col("id") % 3 == 0, F.lit(7)).otherwise(F.col("id") % 11)
    )
    got = heavy_hitters(df, "v", k=1, by_cols=["g"]).collect()
    by_g = {r["g"]: r["item"] for r in got}
    assert by_g[0] == 7  # group 0 is all 7s


def test_mixed_lg_k_sketches_merge_instead_of_aborting(spark):
    """Sketch families built at different precisions over time must
    union (result takes the smaller k's accuracy) — without
    allowDifferentLgConfigK the nightly merge died mid-shuffle with
    HLL_UNION_DIFFERENT_LG_K."""
    from adi_226_datawarehouse_project_spark.operators.sketches import (
        build_sketches,
        merge_sketches,
    )

    a = build_sketches(
        spark.range(1000).selectExpr("'g' AS g", "id AS v"), ["g"], "v", lg_k=12
    )
    b = build_sketches(
        spark.range(500, 1500).selectExpr("'g' AS g", "id AS v"), ["g"], "v", lg_k=13
    )
    est = merge_sketches(a.unionByName(b), ["g"]).collect()[0]["distinct_estimate"]
    assert abs(est - 1500) / 1500 < 0.1, est


def test_merge_sketches_without_n_rows_column(spark):
    """A pared-down (grain, sketch) projection — e.g. from an external
    writer — must still merge; n_rows is summed only when present."""
    from adi_226_datawarehouse_project_spark.operators.sketches import (
        build_sketches,
        merge_sketches,
    )

    s = build_sketches(
        spark.range(100).selectExpr("'g' AS g", "id AS v"), ["g"], "v"
    ).select("g", "sketch")
    out = merge_sketches(s, ["g"])
    assert "n_rows" not in out.columns
    assert abs(out.collect()[0]["distinct_estimate"] - 100) < 10
