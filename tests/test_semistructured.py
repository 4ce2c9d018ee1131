"""VARIANT semi-structured handling: schema-free parse of the
fixtures' events.props, typed field extraction vs the from_json
baseline, ragged/evolving payloads, parquet roundtrip, shredding."""

import shutil

from conftest import SF_SMALL
from pyspark.sql import Row
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.functions.semistructured import (
    shred_variant,
    to_variant,
    variant_field,
)
from adi_226_datawarehouse_project_spark.sources.catalog import load_table

BASE = "/tmp/spark_graft_io/test_variant"


def test_variant_matches_from_json_on_fixture_props(spark):
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "props")
    v = ev.withColumn("v", to_variant("props"))
    got = {
        r["event_id"]: r["k"]
        for r in v.select("event_id", variant_field("v", "$.k", "bigint").alias("k")).collect()
    }
    want = {
        r["event_id"]: r["k"]
        for r in ev.select(
            "event_id",
            F.from_json("props", "k BIGINT").getField("k").alias("k"),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_ragged_payloads_and_parquet_roundtrip(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    rows = [
        Row(id=1, js='{"a": 1, "tags": ["x", "y"]}'),
        Row(id=2, js='{"a": "not-an-int", "extra": {"deep": true}}'),
        Row(id=3, js='{"tags": []}'),
    ]
    v = spark.createDataFrame(rows).select("id", to_variant("js").alias("v"))
    v.write.parquet(f"{BASE}/var")
    back = spark.read.parquet(f"{BASE}/var")
    assert dict(back.dtypes)["v"] == "variant"
    got = {
        r["id"]: (r["a"], r["t0"], r["deep"])
        for r in back.select(
            "id",
            variant_field("v", "$.a", "bigint").alias("a"),
            variant_field("v", "$.tags[0]", "string").alias("t0"),
            variant_field("v", "$.extra.deep", "boolean").alias("deep"),
        ).collect()
    }
    # try_ semantics: wrong type → NULL, missing path → NULL
    assert got == {1: (1, "x", None), 2: (None, None, True), 3: (None, None, None)}


def test_shredding_projects_typed_columns(spark):
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "props").limit(100)
    shredded = shred_variant(
        ev.withColumn("v", to_variant("props")),
        "v",
        {"k_val": ("$.k", "bigint")},
        keep_variant=False,
    )
    assert "v" not in shredded.columns and "k_val" in shredded.columns
    assert dict(shredded.dtypes)["k_val"] == "bigint"
    assert shredded.filter(F.col("k_val").isNotNull()).count() > 0
