"""Bucketed co-located joins (the DISTKEY analog, SURVEY §4): joining
two tables bucketed on the join key must plan ZERO shuffle exchanges,
and must produce exactly the rows of the plain (shuffled) join."""

import pytest
from conftest import SF_SMALL

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.sources.writers import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed_table(lineitem, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders, lineitem = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).select("o_orderkey", "l_linenumber")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed):
    orders, lineitem = bucketed
    bucketed_rows = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy()
        .agg({"l_quantity": "sum", "*": "count"})
        .collect()[0]
    )
    o = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    plain_rows = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy()
        .agg({"l_quantity": "sum", "*": "count"})
        .collect()[0]
    )
    assert tuple(bucketed_rows) == tuple(plain_rows)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed):
    orders, _ = bucketed
    agg = orders.groupBy("o_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
