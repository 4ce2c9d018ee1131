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


# ---------------------------------------------------------------- fuzzy


def _fuzzy_fixtures(spark):
    from pyspark.sql import Row

    bench = spark.createDataFrame(
        [
            Row(bid=100, text="what is the boiling point of water"),  # 7 words
            Row(bid=101, text="name the largest planet"),             # 4 words: no 8-gram exists
        ]
    )
    verbatim = "what is the boiling point of water"
    padded = "quiz item name the largest planet thanks"
    unrelated = "completely different text about gardening tools and soil quality"
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text=verbatim),
            Row(doc_id=2, text=padded),
            Row(doc_id=3, text=unrelated),
        ]
    )
    return bench, train


def test_fuzzy_catches_short_bench_items_exact_misses(spark):
    from adi_226_datawarehouse_project_spark.operators.decontamination import (
        decontaminate,
        fuzzy_contamination_pairs,
        fuzzy_decontaminate,
    )

    bench, train = _fuzzy_fixtures(spark)
    # the exact 8-gram detector: short docs clamp to ONE whole-doc
    # gram, so the verbatim 7-word copy IS caught — but the padded
    # copy of the 4-word item slips through (its whole-doc gram
    # differs and no real 8-gram matches)
    survivors_exact = {r["doc_id"] for r in decontaminate(
        train, bench.withColumnRenamed("bid", "doc_id"), "doc_id", "text", n=8
    ).collect()}
    assert survivors_exact == {2, 3}
    # the fuzzy detector catches both: the verbatim copy at est 1.0 and
    # the padded copy via 3-word shingle resemblance
    pairs = {
        (r["doc_id"], r["bid"]): r["jaccard_est"]
        for r in fuzzy_contamination_pairs(
            train, bench, "doc_id", "text", "bid",
            shingle_size=3, min_jaccard_est=0.3,
        ).collect()
    }
    assert pairs[(1, 100)] == 1.0
    assert (2, 101) in pairs and pairs[(2, 101)] >= 0.3
    assert not any(t == 3 for (t, _) in pairs)
    survivors = {r["doc_id"] for r in fuzzy_decontaminate(
        train, bench, "doc_id", "text", "bid",
        shingle_size=3, min_jaccard_est=0.3,
    ).collect()}
    assert survivors == {3}


def test_fuzzy_estimates_track_exact_jaccard(spark):
    """Every flagged pair's estimate must sit within the 64-hash
    binomial envelope of the TRUE shingle Jaccard (±0.2 > 3 sigma)."""
    from pyspark.sql import Row

    from adi_226_datawarehouse_project_spark.operators.decontamination import (
        fuzzy_contamination_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog near the riverbank "
            "while autumn leaves drift slowly past the old stone bridge").split()
    docs, bdocs = [], []
    for i in range(6):
        # progressively perturbed copies: replace i*2 words
        toks = list(base)
        for j in range(i * 2):
            toks[3 + 2 * j] = f"sub{i}_{j}"
        docs.append(Row(doc_id=i, text=" ".join(toks)))
    bdocs.append(Row(bid=0, text=" ".join(base)))
    train, bench = spark.createDataFrame(docs), spark.createDataFrame(bdocs)
    got = {
        r["doc_id"]: r["jaccard_est"]
        for r in fuzzy_contamination_pairs(
            train, bench, "doc_id", "text", "bid",
            shingle_size=3, min_jaccard_est=0.05,
        ).collect()
    }

    def true_j(a, b):
        sa = {" ".join(a[k : k + 3]) for k in range(len(a) - 2)}
        sb = {" ".join(b[k : k + 3]) for k in range(len(b) - 2)}
        return len(sa & sb) / len(sa | sb)

    for i, row in enumerate(docs):
        tj = true_j(row.text.split(), base)
        if i in got:
            assert abs(got[i] - tj) <= 0.2, (i, got[i], tj)
        else:
            assert tj < 0.25, (i, tj)  # only genuinely-low pairs may be absent


def test_fuzzy_bench_side_broadcasts_no_udf(spark):
    from adi_226_datawarehouse_project_spark.operators.decontamination import (
        fuzzy_contamination_pairs,
    )

    bench, train = _fuzzy_fixtures(spark)
    out = fuzzy_contamination_pairs(train, bench, "doc_id", "text", "bid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # band join + both signature re-attach joins ride broadcasts of the
    # bench side
    assert plan.count("BroadcastHashJoin") >= 2
