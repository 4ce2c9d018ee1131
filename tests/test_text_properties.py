"""Hypothesis property tests for the text functions: Spark's Java-regex
scrub vs an independent Python `re` reference, scrub idempotency, and
the rolling fingerprint vs a Python fold. ASCII-only alphabets — the
PII patterns are specified for ASCII, and it keeps Java/Python \\b and
\\d semantics identical."""

from __future__ import annotations

import hashlib
import re
import string

from hypothesis import given, settings, strategies as st

from adi_226_datawarehouse_project_spark.functions.text import (
    _PII_PATTERNS,
    _ROLL_BASE,
    _ROLL_MOD,
    pii_match_count,
    rolling_fingerprint,
    scrub_pii,
)

_ALPHABET = string.ascii_letters + string.digits + " @.-+_:/()[]"

_texts = st.lists(
    st.text(alphabet=_ALPHABET, min_size=0, max_size=60), min_size=1, max_size=8
)


def _py_scrub(text: str) -> str:
    for _, pat in _PII_PATTERNS:
        text = re.sub(pat, "[PII]", text)
    return text


def _spark_scrub(spark, rows):
    df = spark.createDataFrame([(r,) for r in rows], ["text"])
    out = df.select(
        scrub_pii("text").alias("s"), pii_match_count("text").alias("c")
    ).collect()
    return [r["s"] for r in out], [r["c"] for r in out]


@settings(max_examples=12, deadline=None)
@given(_texts)
def test_scrub_matches_python_re(spark, rows):
    got, counts = _spark_scrub(spark, rows)
    for r, g, c in zip(rows, got, counts):
        want = _py_scrub(r)
        assert g == want
        # count = markers added (input alphabet can itself contain
        # '[PII]' substrings, which the length-delta count includes —
        # mirror that in the reference)
        assert c == want.count("[PII]")


@settings(max_examples=12, deadline=None)
@given(_texts)
def test_scrub_is_idempotent(spark, rows):
    once, _ = _spark_scrub(spark, rows)
    twice, _ = _spark_scrub(spark, once)
    assert twice == once


def _py_roll(text: str) -> int:
    acc = 0
    for t in text.lower().split():
        h = int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % _ROLL_MOD
        acc = (acc * _ROLL_BASE + h) % _ROLL_MOD
    return acc


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(alphabet=string.ascii_lowercase + " ", max_size=80),
        min_size=1,
        max_size=8,
    )
)
def test_rolling_fingerprint_matches_python(spark, rows):
    df = spark.createDataFrame([(r,) for r in rows], ["text"])
    got = [r["v"] for r in df.select(rolling_fingerprint("text").alias("v")).collect()]
    assert got == [_py_roll(r) for r in rows]
