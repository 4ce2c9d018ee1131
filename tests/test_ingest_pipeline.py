"""Incremental corpus ingestion: O(batch) folds against the persisted
MinHash index — idempotent replays, the no-cross-near-dup invariant,
and convergence with the batch-at-once curation."""

from __future__ import annotations

import pytest
from conftest import SF_SMALL
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.dedup import (
    minhash_near_dup_pairs,
)
from adi_226_datawarehouse_project_spark.pipelines.ingest_pipeline import (
    ingest_increment,
    ingested_batches,
    init_corpus,
    read_corpus,
)
from adi_226_datawarehouse_project_spark.sources.catalog import load_table

EST = 0.7


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """Three increments of the sf0.001 documents table (split by
    doc_id % 3) folded into a fresh corpus."""
    d = str(tmp_path_factory.mktemp("inc_corpus"))
    init_corpus(spark, d)
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    results = []
    for b in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == b)
        results.append(ingest_increment(spark, batch, d, batch_id=f"b{b}"))
    return d, docs, results


def test_increments_ingest_and_are_marked(spark, corpus):
    d, docs, results = corpus
    assert all(not r["skipped"] for r in results)
    assert sum(r["n_kept"] for r in results) == read_corpus(spark, d).count() > 0
    assert ingested_batches(spark, d) == {"b0", "b1", "b2"}


def test_reingest_is_noop(spark, corpus):
    d, docs, _ = corpus
    before = read_corpus(spark, d).count()
    again = ingest_increment(
        spark, docs.filter(F.col("doc_id") % 3 == 1), d, batch_id="b1"
    )
    assert again["skipped"] and read_corpus(spark, d).count() == before


def test_no_cross_near_dups_among_survivors(spark, corpus):
    """The index invariant: the curated corpus contains NO pair of docs
    at est >= the operating threshold — every later arrival that would
    have formed one was dropped at ingest."""
    d, _, _ = corpus
    kept = read_corpus(spark, d).select("doc_id", "text")
    pairs = minhash_near_dup_pairs(
        kept, "doc_id", "text", shingle="word", min_jaccard_est=EST
    )
    assert pairs.count() == 0


def test_crash_replay_converges(spark, corpus, tmp_path):
    """A batch whose marker write 'crashed' (docs/index appended,
    marker missing) re-runs and converges: every already-appended doc
    collides with itself in the index at est 1.0 and is dropped, so
    the re-run appends nothing new."""
    import os
    import shutil

    d0, docs, _ = corpus
    d = str(tmp_path / "crash_corpus")
    shutil.copytree(d0, d)
    # simulate the crash: forget the marker for a would-be new batch
    # by ingesting it fully, then deleting the batches zone rows
    batch = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    r1 = ingest_increment(spark, batch, d, batch_id="bx")
    assert not r1["skipped"]
    n_after = read_corpus(spark, d).count()
    # wipe the marker zone back to the pre-bx state
    shutil.rmtree(os.path.join(d, "batches"))
    init_marker = spark.createDataFrame(
        [(f"b{i}", 0, 0) for i in range(3)],
        "batch_id string, n_in bigint, n_kept bigint",
    )
    init_marker.write.parquet(os.path.join(d, "batches"))
    r2 = ingest_increment(spark, batch, d, batch_id="bx")
    assert not r2["skipped"] and r2["n_kept"] == 0  # everything deduped
    assert read_corpus(spark, d).count() == n_after
