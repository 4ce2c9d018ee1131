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


def test_salt_column_never_in_output(spark):
    """VERDICT r10 #3/#4: the (documented) retry nondeterminism of the
    round-robin salt is safe ONLY while the salt never persists — pin
    that both operators drop it and the output schema is salt-free."""
    from adi_226_datawarehouse_project_spark.operators.skew import _SALT

    orders = load_table(spark, SF_SMALL, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = load_table(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(orders, customer, on=["c_custkey"], buckets=4)
    assert _SALT not in joined.columns
    assert set(joined.columns) == set(orders.columns) | {"c_mktsegment"}
    li = load_table(spark, SF_SMALL, "lineitem")
    agged = salted_agg(li, ["l_returnflag"], sums=["l_quantity"], buckets=4)
    assert agged.columns == ["l_returnflag", "sum_l_quantity", "n_rows"]


def test_reserved_salt_column_rejected(spark):
    """An input already carrying __salt would be silently clobbered —
    refuse loudly instead."""
    import pytest

    df = spark.range(4).withColumn("__salt", F.lit(1))
    with pytest.raises(ValueError, match="__salt"):
        salted_agg(df, ["id"])
    with pytest.raises(ValueError, match="__salt"):
        salted_join(df, spark.range(2), on=["id"])
    with pytest.raises(ValueError, match="__salt"):
        salted_join(spark.range(2), df, on=["id"])


def test_content_hash_salt_deterministic_and_correct(spark):
    """salt_on = the cluster-safe mode (ADVICE r10): a pure content
    hash recomputes identically on any retry. Parity with the plain
    plan, spread across buckets, and bit-stable across evaluations."""
    from adi_226_datawarehouse_project_spark.operators.skew import _row_salt

    li = load_table(spark, SF_SMALL, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count("*").alias("n_rows"),
    )
    salted = salted_agg(
        li, ["l_returnflag"], sums=["l_quantity"], buckets=8,
        salt_on=["l_orderkey", "l_linenumber"],
    )
    a = {r["l_returnflag"]: (r["sum_l_quantity"], r["n_rows"]) for r in plain.collect()}
    b = {r["l_returnflag"]: (r["sum_l_quantity"], r["n_rows"]) for r in salted.collect()}
    assert a == b
    # deterministic: two independent evaluations produce identical salts
    s1 = li.withColumn("s", _row_salt(li, 16, ["l_orderkey", "l_linenumber"]))
    one = s1.select(F.sum(F.col("s") * F.col("l_orderkey")).alias("chk")).collect()[0]["chk"]
    two = s1.select(F.sum(F.col("s") * F.col("l_orderkey")).alias("chk")).collect()[0]["chk"]
    assert one == two
    # and it still spreads: every bucket hit on a high-cardinality discriminator
    dist = s1.groupBy("s").count().collect()
    assert len(dist) == 16
    # join parity under salt_on as well
    orders = load_table(spark, SF_SMALL, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = load_table(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    plain_j = sorted(
        map(tuple,
            orders.join(customer, "c_custkey")
            .select("o_orderkey", "c_mktsegment").collect())
    )
    salted_j = sorted(
        map(tuple,
            salted_join(orders, customer, on=["c_custkey"], buckets=8,
                        salt_on=["o_orderkey"])
            .select("o_orderkey", "c_mktsegment").collect())
    )
    assert plain_j == salted_j
