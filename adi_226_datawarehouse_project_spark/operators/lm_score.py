"""N-gram language-model scoring over a document corpus — CCNet-style
perplexity filtering for the training-data pipeline (Wenzek et al.,
arXiv:1911.00359 filter web text by LM perplexity; Gopher/Rae et al.
use the same signal). Documents whose tokens are improbable under a
corpus-level LM (boilerplate, gibberish, lorem-ipsum, wrong-language
residue) score a high negative log-likelihood and can be dropped.

Distributed shape (the tfidf lesson applied):

- per-doc term frequencies are ONE map-side-combined
  ``groupBy(id, token)``; the corpus-wide unigram counts REUSE those
  same rows (``sum(tf)`` over token — no second scan of the corpus,
  no countDistinct);
- the corpus totals (T = total tokens, V = vocabulary size) are a
  1-row aggregate broadcast via cross join — never collected to the
  driver;
- per-token probabilities come from a token-keyed equi-join of the
  (id, token, tf) rows against the vocabulary-sized count table —
  a plain shuffle hash join that AQE can skew-split if a handful of
  stopwords dominate;
- the per-doc score is a final ``groupBy(id)`` — map-side combinable.

Everything is built-in Column expressions; no UDFs anywhere.

Two scoring modes (the tfidf ``ln``/``rational_int`` convention):

- ``mode="ln"`` (default, production): add-one-smoothed unigram NLL,
  ``nll = Σ tf·ln((T+V)/(cnt+1)) / Σ tf`` nats per token, plus
  ``ppl = e^nll``. Reproducible cross-engine only up to libm ulp
  differences; pinned against an independent Python reference in
  ``tests/test_lm.py``.
- ``mode="bits"``: integer bit-surprisal. Per token,
  ``s = floor(log2((T+V) / (cnt+1)))`` computed EXACTLY in integer
  arithmetic as ``length(bin((T+V) div (cnt+1))) - 1`` (for a ≥ b,
  ``floor(log2(a/b)) == floor(log2(a div b))`` — both count the
  leading bit of the quotient), so the per-doc ``Σ tf·s`` is pure
  BIGINT and BIT-EXACT on any engine. This is a true logarithmic
  surprisal at whole-bit granularity; the DuckDB differential oracle
  runs this mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_tokens


def _tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("token")
    )
    return toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))


def unigram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    mode: str = "ln",
) -> DataFrame:
    """Per-document unigram-LM surprisal under the corpus's own
    add-one-smoothed unigram distribution.

    Returns ``(id, n_tokens, ...)`` with mode-dependent score columns:
    ``mode="ln"`` adds ``nll`` (mean nats/token, DOUBLE) and ``ppl``
    (= e^nll); ``mode="bits"`` adds ``surprisal_bits`` (Σ tf·s,
    BIGINT, bit-exact) and ``bits_per_token_milli``
    (= 1000·surprisal_bits div n_tokens, BIGINT).
    """
    if mode not in ("ln", "bits"):
        raise ValueError(f"unknown lm score mode: {mode!r}")
    tf = _tf(df, id_col, text_col)
    counts = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__T"), F.count(F.lit(1)).alias("__V")
    )
    joined = tf.join(counts, "token").crossJoin(F.broadcast(totals))
    if mode == "ln":
        # ln((T+V)/(cnt+1)) > 0 always (cnt <= T, V >= 1).
        term = F.col("tf").cast("double") * (
            F.log((F.col("__T") + F.col("__V")).cast("double"))
            - F.log((F.col("cnt") + 1).cast("double"))
        )
        per_doc = joined.groupBy(id_col).agg(
            F.sum("tf").alias("n_tokens"), F.sum(term).alias("__nll_sum")
        )
        nll = F.col("__nll_sum") / F.col("n_tokens").cast("double")
        return per_doc.select(
            id_col,
            "n_tokens",
            nll.alias("nll"),
            F.exp(nll).alias("ppl"),
        )
    # bits: exact integer floor-log2 of the smoothed odds ratio.
    # bigint/bigint in Spark SQL is DOUBLE division (a cast back would
    # round, not floor) — integer DIV keeps the whole path exact.
    s_bits = F.length(
        F.bin(F.expr("(__T + __V) div (cnt + 1)"))
    ).cast("bigint") - F.lit(1)
    per_doc = joined.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * s_bits).cast("bigint").alias("surprisal_bits"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "surprisal_bits",
        F.expr("(1000 * surprisal_bits) div n_tokens").alias("bits_per_token_milli"),
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lam: float = 0.8,
) -> DataFrame:
    """Per-document interpolated-bigram NLL (nats/token over bigram
    positions): ``p(w2|w1) = lam·c(w1,w2)/c(w1·) + (1-lam)·p1(w2)``
    with ``p1`` the add-one unigram model. Returns
    ``(id, n_bigrams, nll, ppl)``; docs with < 2 tokens drop out
    (no bigram positions — the caller unions them back if needed).

    Shape: per-doc bigram frequencies are one ``groupBy(id, w1, w2)``;
    corpus bigram counts reuse those rows (``sum`` over (w1, w2));
    the context counts c(w1·) reuse the BIGRAM counts (``sum`` over
    w1 — equals unigram counts over non-final positions); unigram
    backoff joins on w2. Three token-keyed equi-joins, one 1-row
    broadcast — no UDFs, no cartesian.
    """
    if not (0.0 < lam < 1.0):
        raise ValueError("lam must be in (0, 1) — pure bigram has zero-prob events")
    toks = df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    )
    pairs = toks.select(
        id_col,
        F.explode(
            F.expr(
                "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
                " (w, i) -> struct(w AS w1, __toks[i + 1] AS w2))"
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bf = pairs.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("bf"))
    bcounts = bf.groupBy("w1", "w2").agg(F.sum("bf").alias("bcnt"))
    ctx = bcounts.groupBy("w1").agg(F.sum("bcnt").alias("ccnt"))
    # unigram distribution over ALL positions (for backoff)
    tf = _tf(df, id_col, text_col)
    ucounts = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    totals = ucounts.agg(F.sum("cnt").alias("__T"), F.count(F.lit(1)).alias("__V"))
    p1 = (F.col("cnt") + 1).cast("double") / (F.col("__T") + F.col("__V")).cast(
        "double"
    )
    joined = (
        bf.join(bcounts, ["w1", "w2"])
        .join(ctx, "w1")
        .join(ucounts.withColumnRenamed("token", "w2"), "w2")
        .crossJoin(F.broadcast(totals))
    )
    p = F.lit(lam) * F.col("bcnt").cast("double") / F.col("ccnt").cast("double") + (
        F.lit(1.0 - lam) * p1
    )
    per_doc = joined.groupBy(id_col).agg(
        F.sum("bf").alias("n_bigrams"),
        F.sum(F.col("bf").cast("double") * -F.log(p)).alias("__nll_sum"),
    )
    nll = F.col("__nll_sum") / F.col("n_bigrams").cast("double")
    return per_doc.select(id_col, "n_bigrams", nll.alias("nll"), F.exp(nll).alias("ppl"))


def perplexity_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_bits_per_token: float = 14.0,
    min_tokens: int = 1,
) -> DataFrame:
    """Keep documents whose exact integer bit-surprisal per token is
    at or below ``max_bits_per_token`` (CCNet keeps the low-perplexity
    head/middle of the corpus). Deterministic on any engine (bits
    mode). Returns the input rows of the survivors."""
    scores = unigram_lm_scores(df, id_col, text_col, mode="bits")
    keep = scores.filter(
        (F.col("n_tokens") >= min_tokens)
        & (
            F.col("bits_per_token_milli")
            <= F.lit(int(round(max_bits_per_token * 1000)))
        )
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    head_frac: float = 1 / 3,
    tail_frac: float = 1 / 3,
    min_tokens: int = 1,
) -> DataFrame:
    """CCNet's actual selection mechanism (Wenzek et al. §4.4): rather
    than one global threshold, rank documents by LM perplexity and
    split the corpus into head / middle / tail buckets (CCNet trains
    on head+middle and drops or down-weights the tail). Returns the
    input rows plus ``bits_per_token_milli`` and ``ppl_bucket``
    ('head' = lowest-perplexity ``head_frac``, 'tail' = highest
    ``tail_frac``, 'middle' = the rest).

    The bucket boundaries are the corpus's own score quantiles,
    computed with ``approx_percentile`` (mergeable t-digest — one
    bounded-memory aggregation regardless of corpus size) and
    broadcast back as a 1-row frame; per-row bucketing is then a
    narrow comparison. Documents under ``min_tokens`` get bucket
    'tail' (too short to score meaningfully)."""
    if not (0 < head_frac and 0 < tail_frac and head_frac + tail_frac < 1):
        raise ValueError(f"bad fractions: head={head_frac}, tail={tail_frac}")
    scores = unigram_lm_scores(df, id_col, text_col, mode="bits").select(
        id_col, "n_tokens", "bits_per_token_milli"
    )
    cuts = scores.filter(F.col("n_tokens") >= min_tokens).agg(
        F.expr(
            f"approx_percentile(bits_per_token_milli, {head_frac}, 10000)"
        ).alias("__head_cut"),
        F.expr(
            f"approx_percentile(bits_per_token_milli, {1.0 - tail_frac}, 10000)"
        ).alias("__tail_cut"),
    )
    bucketed = (
        df.join(scores, id_col, "left")
        .crossJoin(F.broadcast(cuts))
        .withColumn(
            "ppl_bucket",
            F.when(
                F.col("n_tokens").isNull() | (F.col("n_tokens") < min_tokens),
                F.lit("tail"),
            )
            .when(F.col("bits_per_token_milli") <= F.col("__head_cut"), "head")
            .when(F.col("bits_per_token_milli") > F.col("__tail_cut"), "tail")
            .otherwise("middle"),
        )
        .drop("__head_cut", "__tail_cut", "n_tokens")
    )
    return bucketed
