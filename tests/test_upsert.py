"""incremental_upsert contracts (J2/J3): idempotency must hold for
NULL keys too — a plain equality anti-join never matches NULL=NULL, so
dirty NULL-key staging rows were re-appended on EVERY run."""

from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.upsert import incremental_upsert


def test_null_key_rows_upsert_idempotently(spark):
    existing = spark.createDataFrame(
        [(1, "a")], "k INT, v STRING"
    )
    incoming = spark.createDataFrame(
        [(2, "b"), (None, "dirty")], "k INT, v STRING"
    )
    once = incremental_upsert(existing, incoming, ["k"])
    assert once.count() == 3  # 1 existing + 2 new (NULL key included)
    twice = incremental_upsert(once, incoming, ["k"])
    assert twice.count() == 3  # second run adds ZERO rows, NULL key too
    # and the null-safe join didn't block real new keys
    third = incremental_upsert(
        twice, spark.createDataFrame([(3, "c")], "k INT, v STRING"), ["k"]
    )
    assert third.count() == 4


def test_shared_lineage_incoming_resolves(spark):
    """`incoming` derived from `existing` ITSELF (shared plan lineage,
    identical expression ids) — the worst case for DataFrame-attribute
    refs in the join condition, which can resolve ambiguously or
    trivially-true under a self-join. The alias-qualified condition
    must still dedupe by key, not re-append everything."""
    existing = spark.createDataFrame(
        [(1, "a"), (None, "n")], "k INT, v STRING"
    )
    incoming = existing.withColumn("v", F.concat(F.col("v"), F.lit("-v2")))
    out = incremental_upsert(existing, incoming, ["k"])
    # every incoming key (1 and NULL) already exists -> nothing added,
    # and the surviving rows are the EXISTING payloads
    got = sorted(
        ((r["k"], r["v"]) for r in out.collect()),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert got == [(1, "a"), (None, "n")]
    # a genuinely new key derived from the same lineage still inserts
    grown = incremental_upsert(
        existing, incoming.withColumn("k", F.col("k") + 10), ["k"]
    )
    assert grown.count() == 3


def test_multi_key_null_safe(spark):
    existing = spark.createDataFrame(
        [(1, None, "a")], "k1 INT, k2 STRING, v STRING"
    )
    incoming = spark.createDataFrame(
        [(1, None, "a2"), (1, "x", "b")], "k1 INT, k2 STRING, v STRING"
    )
    out = incremental_upsert(existing, incoming, ["k1", "k2"])
    # (1,NULL) already exists -> skipped; (1,'x') is new
    assert out.count() == 2
    assert out.filter(F.col("k2").isNull()).collect()[0]["v"] == "a"
