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


def test_index_append_order_sigs_before_bands(spark, corpus, tmp_path, monkeypatch):
    """Crash window INSIDE the index append pair. Sigs must land before
    bands: the candidate scorer inner-joins index_sigs, so a band row
    whose sig is missing silently fails verification and admits real
    near-dups of that doc FOREVER. The sig-without-bands partial state
    is inert (no band rows → no candidates → the crashed doc is merely
    re-appended on replay — the documented docs-zone sweep posture),
    and the index never violates the bands ⊆ sigs key invariant."""
    import os
    import shutil

    from adi_226_datawarehouse_project_spark.pipelines import ingest_pipeline as IP

    d0, docs, _ = corpus
    d = str(tmp_path / "crash_mid_index")
    shutil.copytree(d0, d)
    # NOVEL English docs (every corpus doc is already indexed — an
    # exact-dup batch would have zero survivors and append zero index
    # rows, making the order pin vacuous; and the clean stage's
    # lang/quality gates reject non-English gibberish)
    nouns = ["cat", "dog", "bird", "horse", "river", "mountain",
             "garden", "house", "teacher", "doctor", "painter", "sailor"]
    verbs = ["walked", "jumped", "painted", "watched", "followed", "carried",
             "visited", "crossed", "repaired", "opened", "studied", "planted"]
    places = ["market", "harbor", "forest", "village", "bridge", "library",
              "station", "meadow", "castle", "island", "valley", "museum"]
    rows = []
    for i in range(40):
        text = (
            f"the {nouns[i % 12]} {verbs[(i * 3 + 2) % 12]} to the "
            f"{places[(i * 9 + 4) % 12]} and then the {nouns[(i * 5 + 3) % 12]} "
            f"{verbs[(i * 11 + 5) % 12]} near the old {places[(i * 5 + 7) % 12]} "
            f"while a young {nouns[(i * 7 + 1) % 12]} quietly "
            f"{verbs[(i * 7 + 9) % 12]} beside the {places[(i * 3 + 1) % 12]} "
            f"before everyone returned home for the evening meal together"
        )
        rows.append((2_000_000 + i, text, "en", "synthetic"))
    batch = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )

    calls: list[str] = []
    real = IP.observed_write_parquet
    armed = {"on": True}

    def crashing(df, path, mode="overwrite", **kw):
        zone = os.path.basename(os.path.normpath(path))
        if mode == "append":
            calls.append(zone)
        if armed["on"] and zone == "index_bands" and mode == "append":
            raise RuntimeError("simulated crash before the bands append")
        return real(df, path, mode=mode, **kw)

    monkeypatch.setattr(IP, "observed_write_parquet", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest_increment(spark, batch, d, batch_id="bc")

    # ORDER PIN: the sigs append committed before the bands append ran
    assert "index_sigs" in calls
    assert calls.index("index_sigs") < calls.index("index_bands")

    # key invariant after the crash: every banded id has its signature
    band_ids = {r["doc_id"] for r in spark.read.parquet(
        os.path.join(d, "index_bands")).select("doc_id").distinct().collect()}
    sig_ids = {r["doc_id"] for r in spark.read.parquet(
        os.path.join(d, "index_sigs")).select("doc_id").distinct().collect()}
    assert band_ids <= sig_ids and sig_ids - band_ids  # partial = sigs only

    # replay converges: marker never landed, so the batch re-runs; the
    # batch docs ARE re-appended (their bands were lost), which is the
    # documented duplicate-sweep posture — after the doc_id sweep the
    # corpus satisfies the no-cross-near-dup invariant and the index is
    # key-consistent again.
    armed["on"] = False
    r = ingest_increment(spark, batch, d, batch_id="bc")
    assert not r["skipped"]
    swept = read_corpus(spark, d).dropDuplicates(["doc_id"])
    pairs = minhash_near_dup_pairs(
        swept, "doc_id", "text", shingle="word", min_jaccard_est=EST
    )
    assert pairs.count() == 0
    band_ids = {r["doc_id"] for r in spark.read.parquet(
        os.path.join(d, "index_bands")).select("doc_id").distinct().collect()}
    sig_ids = {r["doc_id"] for r in spark.read.parquet(
        os.path.join(d, "index_sigs")).select("doc_id").distinct().collect()}
    assert band_ids == sig_ids
