"""Dynamic partition pruning: joining a year-partitioned fact against
a selectively-filtered dim must inject a runtime pruning subquery into
the fact scan's PartitionFilters, so only the surviving years' files
are read — the mechanism that makes dim-filtered fact queries scan
1/N of a 100 TB partitioned table."""

import shutil

from conftest import SF_SMALL
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.sources.catalog import load_table

BASE = "/tmp/spark_graft_io/test_dpp"


def test_dim_filter_prunes_fact_partitions_at_runtime(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    orders = load_table(spark, SF_SMALL, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(f"{BASE}/fact")
    orders.select(F.year("o_orderdate").alias("d_year")).distinct().withColumn(
        "d_name", F.concat(F.lit("Y"), F.col("d_year"))
    ).write.mode("overwrite").parquet(f"{BASE}/dim")

    fact = spark.read.parquet(f"{BASE}/fact")
    dim = spark.read.parquet(f"{BASE}/dim").filter(F.col("d_name") == "Y1997")
    joined = fact.join(dim, fact.o_year == dim.d_year).groupBy("o_year").count()

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

    rows = joined.collect()
    expected = orders.filter(F.col("o_year") == 1997).count()
    assert [(r["o_year"], r["count"]) for r in rows] == [(1997, expected)]
