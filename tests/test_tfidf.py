"""TF-IDF term extraction: ln mode vs a pure-Python reference, plus
rational_int mode determinism and plan-shape checks."""

from __future__ import annotations

import math

import pytest

from adi_226_datawarehouse_project_spark.operators.tfidf import tf_idf_terms

_DOCS = [
    (0, "spark runs fast fast fast"),
    (1, "spark runs slow"),
    (2, "duck walks slow slow"),
    (3, "unique pelican"),
]


def _py_tfidf(docs, top_k):
    """Independent reference: smooth ln idf, token tie-break."""
    toks = {i: t.lower().split() for i, t in docs}
    tf = {(i, w): toks[i].count(w) for i in toks for w in set(toks[i])}
    dfreq: dict[str, int] = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    n = len(docs)
    out = {}
    for i in toks:
        scored = sorted(
            (
                (-(tf[(i, w)] * (math.log((n + 1) / (dfreq[w] + 1)) + 1)), w)
                for w in set(toks[i])
            ),
        )
        out[i] = [(w, -s) for s, w in scored[:top_k]]
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id BIGINT, text STRING")


def test_ln_mode_matches_python_reference(spark, docs_df):
    got = tf_idf_terms(docs_df, "doc_id", "text", top_k=2, idf="ln").collect()
    want = _py_tfidf(_DOCS, 2)
    by_doc: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["doc_id"], r["rank"])):
        by_doc.setdefault(r["doc_id"], []).append((r["token"], r["score"]))
    assert set(by_doc) == set(want)
    for i, pairs in want.items():
        assert [t for t, _ in by_doc[i]] == [t for t, _ in pairs]
        for (_, s_got), (_, s_want) in zip(by_doc[i], pairs):
            assert s_got == pytest.approx(s_want, rel=1e-12)


def test_rational_mode_is_integral_and_rank_consistent(spark, docs_df):
    got = tf_idf_terms(docs_df, "doc_id", "text", top_k=2, idf="rational_int").collect()
    assert all(isinstance(r["score"], int) for r in got)
    # 'fast' (tf=3, df=1) out-ranks both df=2 terms; 'runs' wins the
    # exact score tie against 'spark' lexicographically.
    doc0 = sorted((r for r in got if r["doc_id"] == 0), key=lambda r: r["rank"])
    assert doc0[0]["token"] == "fast" and doc0[1]["token"] == "runs"


def test_bad_variant_rejected(spark, docs_df):
    with pytest.raises(ValueError):
        tf_idf_terms(docs_df, "doc_id", "text", idf="tf_only")


def test_no_udf_and_no_cartesian_over_corpus(spark, docs_df):
    plan = (
        tf_idf_terms(docs_df, "doc_id", "text", top_k=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    # the only nested-loop join allowed is the 1-row broadcast of N
    assert plan.count("CartesianProduct") == 0


def test_rational_mode_overflow_guard(spark):
    from adi_226_datawarehouse_project_spark.operators.tfidf import (
        _RATIONAL_SCALE,
        _rational_score_expr,
    )

    max_i64 = (1 << 63) - 1

    def _score(tf, dfreq, n):
        frame = spark.createDataFrame([(tf, dfreq, n)], "tf BIGINT, df BIGINT, __N BIGINT")
        return frame.select(_rational_score_expr().alias("s")).collect()[0]["s"]

    # exactly at the bound: passes and the arithmetic is exact
    n = 10_000_000
    tf_max = max_i64 // (n + 1) // _RATIONAL_SCALE
    assert _score(tf_max, 0, n) == tf_max * _RATIONAL_SCALE * (n + 1)
    # one past the bound: the guard must raise, not wrap
    with pytest.raises(Exception, match="overflow"):
        _score(tf_max + 1, 0, n)
