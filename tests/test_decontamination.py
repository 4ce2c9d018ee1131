"""Unit tests for benchmark decontamination (n-gram overlap scrub)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.decontamination import (
    benchmark_gram_set,
    contamination_scores,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpora(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id BIGINT, text STRING",
    )
    train = spark.createDataFrame(
        [
            # shares 3-grams "alpha beta gamma", "beta gamma delta", ... (heavy overlap)
            (1, "alpha beta gamma delta epsilon"),
            # exactly ONE shared 3-gram ("alpha beta gamma"); rest disjoint
            (2, "alpha beta gamma nine ten eleven twelve"),
            # disjoint vocabulary
            (3, "one two three four five six"),
            # repeated shared gram must count ONCE (distinct-gram semantics)
            (4, "alpha beta gamma xx alpha beta gamma yy"),
        ],
        "doc_id BIGINT, text STRING",
    )
    return bench, train


def test_contamination_scores_distinct_gram_counts(spark, corpora):
    bench, train = corpora
    grams = benchmark_gram_set(bench, "text", n=3)
    scores = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination_scores(train, grams, "doc_id", "text", n=3).collect()
    }
    assert scores[1] == 3  # alpha-beta-gamma, beta-gamma-delta, gamma-delta-epsilon
    assert scores[2] == 1
    assert 3 not in scores  # no overlap → no row at all
    assert scores[4] == 1  # repeated gram counted once


def test_decontaminate_threshold(spark, corpora):
    bench, train = corpora
    survivors = lambda k: sorted(  # noqa: E731
        r["doc_id"]
        for r in decontaminate(train, bench, "doc_id", "text", n=3, min_overlap=k).collect()
    )
    assert survivors(1) == [3]          # any overlap contaminates
    assert survivors(2) == [2, 3, 4]    # single-gram hits survive
    assert survivors(10) == [1, 2, 3, 4]


def test_decontaminate_keeps_full_rows_and_is_broadcast(spark, corpora):
    bench, train = corpora
    out = decontaminate(
        train.withColumn("extra", F.lit("x")), bench, "doc_id", "text", n=3, min_overlap=1
    )
    assert out.columns == ["doc_id", "text", "extra"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # bench gram set + contaminated-id set are broadcast; the corpus
    # itself must not shuffle and nothing may cross-join.
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
