"""Cost-based optimizer statistics: ANALYZE-collected table/column
stats flow into plan cardinality estimates, and a filtered
large-on-disk dimension qualifies for a broadcast join ONLY once
column stats let the CBO see through the filter — the Redshift-
planner-stats analog (reference `README.md:182`)."""

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.sources.catalog import collect_stats

N_BIG = 200_000
N_KEYS = 1_000


@pytest.fixture()
def cbo(spark):
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.cbo.joinReorder.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    # AQE off so the STATIC planner's stats-driven choice is what we see
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for t in ("cbo_dim", "cbo_fact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.range(N_BIG).withColumn("k", F.col("id") % N_KEYS).withColumn(
        "pad", F.md5(F.col("id").cast("string"))
    ).write.mode("overwrite").saveAsTable("cbo_dim")
    # pad keeps BOTH tables above the broadcast threshold on disk
    spark.range(N_BIG).withColumn("k", F.col("id") % N_KEYS).withColumn(
        "pad", F.md5((F.col("id") + 1).cast("string"))
    ).write.mode("overwrite").saveAsTable("cbo_fact")
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)
    for t in ("cbo_dim", "cbo_fact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _join_plan(spark):
    dim = spark.table("cbo_dim").filter(F.col("k") < 10)
    j = spark.table("cbo_fact").join(dim, "k")
    return j._jdf.queryExecution().executedPlan().toString()


def test_stats_visible_and_filter_estimate_sane(cbo):
    spark = cbo
    stats = collect_stats(spark, "cbo_dim", columns=["k", "id"])
    assert stats["row_count"] == N_BIG
    assert stats["size_bytes"] > 0
    est = (
        spark.table("cbo_dim")
        .filter(F.col("k") < 10)
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
        .rowCount()
    )
    true_rows = N_BIG * 10 // N_KEYS
    assert est.isDefined()
    got = int(est.get())
    # CBO interpolates from min/max/NDV: demand the right magnitude
    assert true_rows / 3 <= got <= true_rows * 3


def test_column_stats_flip_filtered_join_to_broadcast(cbo):
    spark = cbo
    # threshold below the dim's on-disk size but far above the
    # filtered cardinality
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1024 * 1024))
    for t in ("cbo_dim", "cbo_fact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}_nostats")
    # without column stats: the filtered dim's size estimate falls back
    # to file size (> threshold) → sort-merge join
    plan_before = _join_plan(spark)
    assert "SortMergeJoin" in plan_before, plan_before
    # with column stats the CBO sees ~1% survive the filter → broadcast
    collect_stats(spark, "cbo_dim", columns=["k"])
    collect_stats(spark, "cbo_fact", columns=["k"])
    plan_after = _join_plan(spark)
    assert "BroadcastHashJoin" in plan_after, plan_after
