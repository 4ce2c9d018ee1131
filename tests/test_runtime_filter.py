"""Runtime bloom-filter join pruning: when a big fact shuffle-joins a
selectively-filtered dim (too big or disabled for broadcast), Catalyst
injects a bloom filter built from the dim's join keys into the fact
side, so non-matching fact rows die at/near the scan instead of
traveling through the shuffle — the row-level complement of dynamic
partition pruning, and the mechanism that keeps a 100 TB fact ⋈
0.1%-selective dim from shuffling 100 TB.

The engine leaves `spark.sql.optimizer.runtime.bloomFilter.enabled`
at its default (true) — this gate pins that the feature actually
fires on this Spark version with this plan shape, and that the
filtered result is value-identical to the unfiltered join."""

import shutil

from conftest import SF_SMALL
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.sources.catalog import load_table

BASE = "/tmp/spark_graft_io/test_runtime_filter"


def test_bloom_filter_injected_into_fact_side_of_shuffle_join(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    lineitem = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, SF_SMALL, "part").select("p_partkey", "p_brand")
    lineitem.write.mode("overwrite").parquet(f"{BASE}/fact")
    part.write.mode("overwrite").parquet(f"{BASE}/dim")

    fact = spark.read.parquet(f"{BASE}/fact")
    dim = spark.read.parquet(f"{BASE}/dim").filter(F.col("p_brand") == "Brand#13")

    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        # force the shuffle-join shape the filter targets: no broadcast,
        # and drop the 10 GB application-side floor so the sf0.001 fact
        # qualifies (at real scale the floor is what keeps tiny scans
        # from paying the bloom build).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        joined = fact.join(dim, fact.l_partkey == dim.p_partkey).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan, plan
        got = joined.collect()[0]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)

    # value parity with the default (broadcast, no runtime filter) plan
    want = (
        fact.join(dim, fact.l_partkey == dim.p_partkey)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()[0]
    )
    assert (got["n"], got["qty"]) == (want["n"], want["qty"])
    assert got["n"] > 0  # non-vacuous: the brand filter keeps some rows
