"""TF-IDF term scoring over a document corpus — keyword extraction /
relevance weighting for the training-data pipeline (topic tagging,
boilerplate spotting, quality signals).

Distributed shape: term frequencies are one map-side-combined
``groupBy(id, token)``; document frequencies reuse those SAME rows
(``(id, token)`` is already distinct, so df is a ``groupBy(token)``
count — no ``countDistinct`` shuffle); the corpus size N is a 1-row
aggregate broadcast via cross join (never collected to the driver);
the per-document top-k is a window partitioned by doc id, whose
per-partition cardinality is the doc's vocabulary — bounded, skew-free.
Everything is built-in Column expressions: no UDFs anywhere.

Two IDF variants:

- ``idf="ln"`` (default, production): smooth sklearn-style
  ``ln((N+1)/(df+1)) + 1``.
- ``idf="rational_int"``: integer-scaled rarity weight
  ``(tf·SCALE·(N+1)) div (df+1)`` computed in pure BIGINT arithmetic.
  Rankings from ``ln`` are reproducible cross-engine only up to libm
  ulp differences; the integer variant is BIT-EXACT on any engine, so
  the DuckDB differential oracle runs this mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import word_tokens

_RATIONAL_SCALE = 1_000_000


def _rational_score_expr():
    """Integer TF-IDF score over columns (tf, df, __N), with a LOUD
    overflow guard (the simhash lane-pack lesson): the numerator
    tf·SCALE·(N+1) must fit a signed 64-bit lane; the bound is exact —
    the max safe tf given N — and raises instead of silently wrapping
    under non-ANSI sessions. Corpora past the bound (N·tf ≳ 9.2e12)
    should use the ln mode, whose floats don't overflow."""
    return F.expr(
        f"CAST(coalesce(CAST(assert_true("
        f"tf <= ((9223372036854775807 div (__N + 1)) div {_RATIONAL_SCALE}),"
        f" 'tfidf rational_int: tf*SCALE*(N+1) would overflow bigint;"
        f" use idf=\"ln\"') AS BIGINT), 0)"
        f" + tf * {_RATIONAL_SCALE} * (__N + 1) AS BIGINT) div (df + 1)"
    )


def tf_idf_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 3,
    idf: str = "ln",
) -> DataFrame:
    """Top-``top_k`` TF-IDF terms per document:
    ``(id, token, tf, df, score, rank)``. Ties break lexicographically
    on token so results are total-ordered and reproducible."""
    if idf not in ("ln", "rational_int"):
        raise ValueError(f"unknown idf variant: {idf!r}")
    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__N"))
    scored = tf.join(docfreq, "token").crossJoin(F.broadcast(n_docs))
    if idf == "ln":
        score = F.col("tf").cast("double") * (
            F.log((F.col("__N") + 1).cast("double") / (F.col("df") + 1).cast("double"))
            + F.lit(1.0)
        )
    else:
        score = _rational_score_expr()
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "token", "tf", "df", "score", "rank")
    )
