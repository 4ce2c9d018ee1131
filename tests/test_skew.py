"""Salting operators: result parity with the unsalted plan, and the
salt actually spreads hot keys."""

from conftest import SF_SMALL

from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.skew import salted_agg, salted_join
from adi_226_datawarehouse_project_spark.sources.catalog import load_table


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).drop("c_custkey")
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        customer,
        on=["c_custkey"],
        buckets=8,
    )
    a = sorted(map(tuple, plain.select("o_orderkey", "c_mktsegment").collect()))
    b = sorted(map(tuple, salted.select("o_orderkey", "c_mktsegment").collect()))
    assert a == b


def test_salted_join_left(spark):
    orders = load_table(spark, SF_SMALL, "orders").withColumnRenamed("o_custkey", "c_custkey")
    nobody = load_table(spark, SF_SMALL, "customer").select("c_custkey").filter(F.lit(False))
    out = salted_join(orders, nobody, on=["c_custkey"], how="left", buckets=4)
    assert out.count() == orders.count()  # left rows survive empty small side


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sum_l_quantity"),
            F.count("*").alias("n_rows"),
        )
    )
    salted = salted_agg(li, ["l_returnflag"], sums=["l_quantity"], buckets=8)
    a = {r["l_returnflag"]: (r["sum_l_quantity"], r["n_rows"]) for r in plain.collect()}
    b = {r["l_returnflag"]: (r["sum_l_quantity"], r["n_rows"]) for r in salted.collect()}
    assert a == b


def test_salt_spreads_rows(spark):
    from adi_226_datawarehouse_project_spark.operators.skew import _row_salt

    li = load_table(spark, SF_SMALL, "lineitem")
    dist = (
        li.withColumn("s", _row_salt(li, 16)).groupBy("s").count().collect()
    )
    assert len(dist) == 16  # every bucket hit
    counts = [r["count"] for r in dist]
    assert max(counts) < 3 * min(counts)  # roughly uniform


def test_salted_join_rejects_outer(spark):
    """right/full outer would duplicate unmatched small-side rows once
    per salt replica — the operator must refuse."""
    import pytest

    orders = load_table(spark, SF_SMALL, "orders").withColumnRenamed("o_custkey", "c_custkey")
    customer = load_table(spark, SF_SMALL, "customer").select("c_custkey")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="inner/left-family"):
            salted_join(orders, customer, on=["c_custkey"], how=how)


def test_salt_spreads_byte_identical_hot_rows(spark):
    """The content-hash salt gave ONE salt to a hot key whose rows are
    byte-identical (repeated heartbeat rows) — one reducer still owned
    the whole group and the mitigation did nothing. The round-robin
    salt must spread them over ~all buckets (and results stay exact,
    pinned by the parity tests above)."""
    from pyspark.sql import functions as F

    from adi_226_datawarehouse_project_spark.operators.skew import _row_salt

    dup = spark.range(10_000).selectExpr("'hot' AS k", "1.0 AS v").drop("id")
    n_salts = (
        dup.withColumn("s", _row_salt(dup, 16)).select("s").distinct().count()
    )
    assert n_salts >= 12, n_salts  # was 1 with the content hash


def test_salted_agg_requires_an_aggregate(spark):
    import pytest

    from adi_226_datawarehouse_project_spark.operators.skew import salted_agg

    df = spark.range(5).selectExpr("id AS k")
    with pytest.raises(ValueError, match="at least one aggregate"):
        salted_agg(df, ["k"], counts=False)
