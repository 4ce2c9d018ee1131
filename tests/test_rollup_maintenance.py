"""Incremental rollup maintenance: day-by-day merges equal the full
recompute exactly for count/sum/min/max (and within HLL tolerance for
distinct), the fold is associative, and read_rollup derives avg /
distinct at read time."""

import pytest
from conftest import SF_SMALL
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.rollup_maintenance import (
    merge_rollups,
    read_rollup,
    rollup_delta,
)
from adi_226_datawarehouse_project_spark.sources.catalog import load_table


def _orders(spark):
    return load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
        F.month("o_orderdate").alias("m"),
    )


ARGS = dict(
    group_cols=["o_orderstatus"],
    sum_cols=["price_cents"],
    min_cols=["price_cents"],
    max_cols=["price_cents"],
    distinct_cols=["o_custkey"],
)


def _slices(df, n=4):
    return [df.filter(F.col("m") % n == i) for i in range(n)]


def test_incremental_merge_equals_full_recompute(spark):
    orders = _orders(spark)
    full = rollup_delta(orders, **ARGS)
    parts = _slices(orders)
    acc = rollup_delta(parts[0], **ARGS)
    for p in parts[1:]:
        acc = merge_rollups(acc, rollup_delta(p, **ARGS), ["o_orderstatus"])

    f = {r["o_orderstatus"]: r for r in read_rollup(full).collect()}
    a = {r["o_orderstatus"]: r for r in read_rollup(acc).collect()}
    assert set(f) == set(a) and len(f) >= 2
    for k in f:
        for col in ("n_rows", "sum_price_cents", "min_price_cents", "max_price_cents"):
            assert f[k][col] == a[k][col], (k, col)
        assert f[k]["avg_price_cents"] == pytest.approx(a[k]["avg_price_cents"])
        # HLL union vs one-shot sketch: identical inputs → identical
        # sketch estimates (merge is lossless for the same lg_k)
        assert f[k]["distinct_o_custkey"] == a[k]["distinct_o_custkey"]
        # and the estimate is near the exact distinct
        exact = (
            orders.filter(F.col("o_orderstatus") == k)
            .agg(F.countDistinct("o_custkey"))
            .collect()[0][0]
        )
        assert abs(f[k]["distinct_o_custkey"] - exact) <= max(3, 0.05 * exact)


def test_merge_is_associative(spark):
    orders = _orders(spark)
    a, b, c, d = _slices(orders)
    r = lambda df: rollup_delta(df, **ARGS)  # noqa: E731
    g = ["o_orderstatus"]
    left = merge_rollups(merge_rollups(r(a), r(b), g), merge_rollups(r(c), r(d), g), g)
    right = merge_rollups(merge_rollups(merge_rollups(r(a), r(b), g), r(c), g), r(d), g)
    lk = {r_["o_orderstatus"]: r_ for r_ in read_rollup(left).collect()}
    rk = {r_["o_orderstatus"]: r_ for r_ in read_rollup(right).collect()}
    assert set(lk) == set(rk)
    for k in lk:
        assert lk[k]["n_rows"] == rk[k]["n_rows"]
        assert lk[k]["sum_price_cents"] == rk[k]["sum_price_cents"]
        assert lk[k]["distinct_o_custkey"] == rk[k]["distinct_o_custkey"]


def test_schema_mismatch_and_unknown_columns_raise(spark):
    orders = _orders(spark)
    r1 = rollup_delta(orders, group_cols=["o_orderstatus"], sum_cols=["price_cents"])
    r2 = rollup_delta(orders, group_cols=["o_orderstatus"])
    with pytest.raises(ValueError, match="schemas differ"):
        merge_rollups(r1, r2, ["o_orderstatus"])
    bad = r1.withColumnRenamed("sum_price_cents", "weird_col")
    with pytest.raises(ValueError, match="non-mergeable"):
        merge_rollups(bad, bad, ["o_orderstatus"])


def test_avg_skips_null_measures_like_true_avg(spark):
    """F.sum skips NULL measures, so read_rollup must divide by the
    per-measure non-null count (cnt_<c>), not n_rows — matching
    AVG()'s NULL semantics exactly."""
    facts = spark.createDataFrame(
        [("a", 10), ("a", None), ("a", 20), ("b", None)],
        "g string, v int",
    )
    roll = rollup_delta(facts, ["g"], sum_cols=["v"])
    got = {
        r["g"]: (r["avg_v"], r["n_rows"])
        for r in read_rollup(roll).collect()
    }
    assert got["a"] == (15.0, 3)  # (10+20)/2 non-null rows, NOT /3
    assert got["b"][0] is None  # all-NULL group → NULL avg, not 0/1
    # and the cnt partials merge associatively like every other state
    merged = merge_rollups(roll, rollup_delta(facts, ["g"], sum_cols=["v"]), ["g"])
    got2 = {r["g"]: r["avg_v"] for r in read_rollup(merged).collect()}
    assert got2["a"] == 15.0 and got2["b"] is None


def test_merge_accepts_legacy_rollup_without_cnt_columns(spark):
    """Rollups persisted before cnt_<c> partials existed must keep
    merging: the legacy side synthesizes cnt_<c> := n_rows (its
    historical every-row-counts avg semantics)."""
    facts = spark.createDataFrame([("a", 10), ("a", 20)], "g string, v int")
    legacy = rollup_delta(facts, ["g"], sum_cols=["v"]).drop("cnt_v")
    delta = rollup_delta(facts, ["g"], sum_cols=["v"])
    merged = merge_rollups(legacy, delta, ["g"])
    row = {r["g"]: (r["n_rows"], r["sum_v"], r["cnt_v"]) for r in merged.collect()}
    assert row["a"] == (4, 60, 4)
    got = read_rollup(merged).collect()[0]
    assert got["avg_v"] == 15.0
