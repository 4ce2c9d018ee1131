"""Write-time telemetry (`DataFrame.observe`): observed rows-written
match the real count with NO second job, and a multi-stage funnel's
per-stage counts all come from one action — the reference's
before/after record logging (SURVEY §5) at zero extra scans."""

import shutil

from conftest import SF_SMALL
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.sources.observe import (
    funnel_counts,
    instrument_funnel,
    observed_write_parquet,
)

BASE = "/tmp/spark_graft_io/test_observe"


def test_observed_write_matches_readback(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    cust = load_table(spark, SF_SMALL, "customer")
    n = observed_write_parquet(cust, f"{BASE}/cust")
    assert n == spark.read.parquet(f"{BASE}/cust").count() > 0


def test_observed_write_partitioned(spark):
    orders = load_table(spark, SF_SMALL, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    n = observed_write_parquet(orders, f"{BASE}/orders", partition_by=["o_year"])
    assert n == orders.count()


def _jobs_run(spark, group, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_observed_write_runs_one_job(spark):
    """The row count must come from the write job itself — the whole
    point vs count-after-write. Pin it via the job-group counter."""
    cust = load_table(spark, SF_SMALL, "customer").localCheckpoint(eager=True)
    n_jobs = _jobs_run(
        spark, "observe-onejob", lambda: observed_write_parquet(cust, f"{BASE}/cust_onejob")
    )
    assert n_jobs == 1, f"expected exactly one job, got {n_jobs}"


def test_funnel_counts_single_action(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    staged, obs = instrument_funnel(
        docs,
        [
            ("lang_en", F.col("lang") == "en"),
            ("long_enough", F.length("text") > 200),
        ],
    )
    n_jobs = _jobs_run(
        spark, "observe-funnel", lambda: observed_write_parquet(staged, f"{BASE}/funnel")
    )
    got = funnel_counts(obs)
    want_in = docs.count()
    want_lang = docs.filter(F.col("lang") == "en").count()
    want_long = docs.filter(
        (F.col("lang") == "en") & (F.length("text") > 200)
    ).count()
    assert got == {"input": want_in, "lang_en": want_lang, "long_enough": want_long}
    assert want_in > want_lang > want_long > 0  # non-degenerate funnel
    # every stage count plus the write came from that ONE write job
    assert n_jobs == 1
