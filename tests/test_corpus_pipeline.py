"""End-to-end LLM corpus-curation pipeline on the DAG executor:
zone outputs, independent count checks, shard layout, idempotent
re-run."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.functions import text as TX
from adi_226_datawarehouse_project_spark.pipelines.corpus_pipeline import (
    run_corpus_pipeline,
)
from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.sources.writers import read_run_manifest

_ZONES = ("clean", "dedup", "decontaminated", "packed", "shards")


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    results = run_corpus_pipeline(spark, sf_dir, out, shard_size=50)
    assert all(r.state == "SUCCESS" for r in results.values()), {
        k: (v.state, v.error) for k, v in results.items()
    }

    # clean zone matches an independently-derived filter + scrub
    docs = load_table(spark, sf_dir, "documents")
    expect_clean = docs.filter(
        (TX.lang_id("text") == "en")
        & (TX.quality_score("text") >= 0.75)
        & (TX.repeated_token_fraction("text") <= 0.8)
    ).count()
    clean = spark.read.parquet(os.path.join(out, "clean"))
    assert clean.count() == expect_clean == results["clean"].value
    # PII scrub is applied (idempotent on already-clean fixtures, but
    # the schema must carry the precomputed token counts)
    assert set(["doc_id", "text", "lang", "source", "n_tokens"]) == set(clean.columns)

    # monotone funnel, nothing vacuous
    n = {z: results[z].value for z in _ZONES}
    assert n["clean"] >= n["dedup"] >= n["decontaminated"] > 0
    # packed and shards are one row per surviving doc
    assert n["packed"] == n["decontaminated"] == n["shards"]

    # shard layout: hive partitions, bounded size, ranks complete
    shards = spark.read.parquet(os.path.join(out, "shards"))
    sizes = {r["shard"]: r["n"] for r in shards.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert all(s <= 50 for s in sizes.values())
    ranks = sorted(r["shuffle_rank"] for r in shards.select("shuffle_rank").collect())
    assert ranks == list(range(n["decontaminated"]))

    # manifest carries every zone's count
    man = read_run_manifest(spark, os.path.join(out, "manifest")).collect()[0]
    for z in _ZONES:
        assert man["stats"][z] == n[z]

    # idempotent re-run: every zone skipped, nothing rewritten
    again = run_corpus_pipeline(spark, sf_dir, out, shard_size=50)
    for z in _ZONES:
        assert again[z].state == "SKIPPED"


def test_corpus_pipeline_failure_poisons_descendants_and_resumes(
    spark, sf_dir, tmp_path, monkeypatch
):
    out = str(tmp_path / "corpus_fail")

    # simulate an operational failure inside the decontamination stage:
    # that task FAILS; packed/shards/manifest must be UPSTREAM_FAILED,
    # clean/dedup still SUCCESS.
    from adi_226_datawarehouse_project_spark.pipelines import corpus_pipeline as cp

    def _boom(*a, **kw):
        raise RuntimeError("simulated stage failure")

    monkeypatch.setattr(cp, "decontaminate", _boom)
    results = run_corpus_pipeline(spark, sf_dir, out)
    monkeypatch.undo()
    assert results["clean"].state == "SUCCESS"
    assert results["dedup"].state == "SUCCESS"
    assert results["decontaminated"].state == "FAILED"
    for t in ("packed", "shards", "manifest"):
        assert results[t].state == "UPSTREAM_FAILED"

    # resume with the fix: completed zones skip, the rest completes
    resumed = run_corpus_pipeline(spark, sf_dir, out)
    assert resumed["clean"].state == "SKIPPED"
    assert resumed["dedup"].state == "SKIPPED"
    assert resumed["decontaminated"].state == "SUCCESS"
    assert resumed["packed"].state == "SUCCESS"
    assert resumed["shards"].state == "SUCCESS"
    assert resumed["manifest"].state == "SUCCESS"
