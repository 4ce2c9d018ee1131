"""Unit tests for operators/market_basket.py (co-purchase pairs + lift).

The cross-engine value oracle is the declared query
``op_copurchase_pairs``; these tests pin the counting semantics on
hand-built baskets, the mega-basket guard, and the plan shape.
"""

import math

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.market_basket import (
    copurchase_pairs,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "basket BIGINT, item BIGINT")


def _run(spark, rows, **kw):
    out = copurchase_pairs(_df(spark, rows), "basket", "item", **kw)
    return {(r.item_a, r.item_b): r for r in out.collect()}


def test_hand_counts_and_lift(spark):
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 30),
        (4, 40),
    ]
    got = _run(spark, rows, min_pair_count=2)
    # (10,20) in baskets 1,2; (10,30) in baskets 1,3; (20,30) only in 1
    assert set(got) == {(10, 20), (10, 30)}
    r = got[(10, 20)]
    assert r.pair_count == 2 and r.count_a == 3 and r.count_b == 2
    assert r.n_baskets == 4
    assert r.lift == math.floor((2 * 4) / (3 * 2) * 1e6 + 0.5) / 1e6


def test_duplicate_lineitems_count_once(spark):
    # same (basket, item) twice must not inflate pair or item counts
    rows = [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20)]
    got = _run(spark, rows, min_pair_count=2)
    r = got[(10, 20)]
    assert r.pair_count == 2 and r.count_a == 2 and r.count_b == 2


def test_mega_basket_guard_drops_whole_basket_consistently(spark):
    # basket 99 exceeds the cap: its pairs AND its contribution to
    # item counts / n_baskets must all disappear together.
    rows = [(1, 10), (1, 20), (2, 10), (2, 20)]
    mega = [(99, i) for i in range(10, 20)]
    got = _run(spark, rows + mega, min_pair_count=2, max_basket_size=5)
    r = got[(10, 20)]
    assert r.pair_count == 2 and r.count_a == 2 and r.count_b == 2
    assert r.n_baskets == 2  # the mega basket is not counted anywhere


def test_min_pair_count_validation(spark):
    with pytest.raises(ValueError, match="min_pair_count"):
        copurchase_pairs(_df(spark, [(1, 10)]), "basket", "item", min_pair_count=0)


def test_pairs_are_ordered_and_support_filtered(spark):
    rows = [(b, i) for b in range(1, 6) for i in (7, 3)]
    got = _run(spark, rows, min_pair_count=5)
    assert set(got) == {(3, 7)}  # item_a < item_b, seen in all 5 baskets
    assert got[(3, 7)].pair_count == 5
    # lift = 5*5/(5*5) = 1.0 for a deterministic co-occurrence
    assert got[(3, 7)].lift == 1.0


def test_plan_has_no_python_udf_and_no_cartesian_on_baskets(spark):
    df = _df(spark, [(1, 10), (1, 20), (2, 10)])
    plan = (
        copurchase_pairs(df, "basket", "item")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only cartesian is the 1-row totals broadcast
    assert plan.count("CartesianProduct") == 0
