"""Schema evolution + malformed-input posture: parquet generations
with added columns unify under mergeSchema (old rows NULL-padded), the
P1 expected-columns contract brings any generation to the target
shape, and the three JSON malformed-record modes behave as documented
(PERMISSIVE captures, DROPMALFORMED drops, FAILFAST raises)."""

import shutil

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.functions.cleaning import ensure_columns

BASE = "/tmp/spark_graft_io/test_schema_evo"


def test_parquet_merge_schema_across_generations(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, name STRING")
    v1.write.parquet(f"{BASE}/tbl/gen=1")
    v2 = spark.createDataFrame(
        [(3, "c", 9.5)], "id INT, name STRING, score DOUBLE"
    )
    v2.write.parquet(f"{BASE}/tbl/gen=2")

    # default read resolves the schema from one footer — score may be
    # missing; mergeSchema unions all generations
    merged = spark.read.option("mergeSchema", "true").parquet(f"{BASE}/tbl")
    assert set(merged.columns) == {"id", "name", "score", "gen"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 9.5}

    # the P1 contract makes any single generation conform
    gen1 = spark.read.parquet(f"{BASE}/tbl/gen=1")
    padded = ensure_columns(gen1, ["id", "name", "score"])
    assert "score" in padded.columns
    assert padded.filter(F.col("score").isNotNull()).count() == 0


def _write_mixed_json(path):
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/data.json", "w") as f:
        f.write('{"id": 1, "v": "ok"}\n')
        f.write("{broken json!!\n")
        f.write('{"id": 2, "v": "fine"}\n')


def test_json_malformed_modes(spark):
    shutil.rmtree(f"{BASE}/json", ignore_errors=True)
    _write_mixed_json(f"{BASE}/json")
    schema = "id INT, v STRING, _corrupt_record STRING"

    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(f"{BASE}/json")
    )
    rows = permissive.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and corrupt[0]["id"] is None

    dropped = (
        spark.read.schema("id INT, v STRING")
        .option("mode", "DROPMALFORMED")
        .json(f"{BASE}/json")
    )
    assert {r["id"] for r in dropped.collect()} == {1, 2}

    failfast = (
        spark.read.schema("id INT, v STRING")
        .option("mode", "FAILFAST")
        .json(f"{BASE}/json")
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        failfast.collect()
