"""Warehouse materialization policies (SPARK_GRAFT_WAREHOUSE_POLICY):
the cache / parquet / hybrid paths must produce IDENTICAL golden-query
results — the policy is pure physical strategy (where the derived
zones live), never semantics. Pinned at sf0.001 against the default
cache path, which every oracle run already validates."""

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.model import star

SF = "/root/testdata/sf0.001"
GOLDENS = (
    "g01_complaints_by_borough_pct",
    "g07_airbnb_complaint_ratio",
    "g09_quarterly_trend",
)


def _teardown(spark):
    star._REGISTERED.pop(id(spark), None)
    spark.catalog.clearCache()


def _fingerprints(spark):
    import __spark_entry__ as entry

    out = {}
    for g in GOLDENS:
        df = entry.queries()[g](spark, SF)
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]
        out[g] = (int(row["n"]), int(row["h"] or 0))
    return out


@pytest.mark.parametrize("policy", ["parquet", "hybrid"])
def test_zone_policies_match_cache_policy(spark, monkeypatch, tmp_path, policy):
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE_DIR", str(tmp_path / "zone"))
    _teardown(spark)
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE_POLICY", "cache")
    star.materialize_warehouse(spark, SF)
    want = _fingerprints(spark)

    _teardown(spark)
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE_POLICY", policy)
    star.materialize_warehouse(spark, SF)
    got = _fingerprints(spark)
    # leave no stale zone-backed views behind for later tests
    _teardown(spark)
    assert got == want


def test_unknown_policy_raises(spark, monkeypatch):
    _teardown(spark)
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE_POLICY", "mystery")
    with pytest.raises(ValueError, match="mystery"):
        star.materialize_warehouse(spark, SF)
    monkeypatch.delenv("SPARK_GRAFT_WAREHOUSE_POLICY")
