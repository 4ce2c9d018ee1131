"""Benchmark decontamination: drop training documents that overlap an
evaluation/benchmark corpus on word n-grams.

The standard training-data hygiene step (GPT-3 §C / PaLM / Llama data
cards all describe the same shape): a training doc is *contaminated*
when at least ``min_overlap`` of its distinct word n-grams appear
anywhere in the benchmark set. Detection is an inverted-index
equi-join, never a pairwise scan:

    bench grams  (distinct, hashed)  ──┐
                                       ├── equi-join on gram hash →
    train grams  (distinct, hashed)  ──┘   groupBy(train id) count

Scale shape: the benchmark side is tiny by construction (eval sets are
thousands of docs, so ~10⁵-10⁶ distinct grams — a few MB hashed), so
its gram set is ``broadcast()`` and the train side streams through a
map-side hash join with ZERO shuffle of the corpus; the only shuffle
is the per-train-doc overlap count, pre-combined map-side. Grams
travel as 8-byte ``xxhash64`` keys, not strings (the
``ngram_jaccard_pairs`` pattern — collision odds ~|grams|²/2⁶⁵ are
negligible).

Reference scope note: the reference warehouse has no decontamination
operator; this is part of the beyond-reference LLM-pipeline family the
build brief asks for (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_ngrams


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """One row per (id, distinct gram hash). array_distinct guarantees
    per-doc uniqueness before the explode, so downstream counts are
    distinct-gram counts without a dedup shuffle."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("__g"),
    ).select(F.col(id_col), F.xxhash64(F.col("__g")).alias("__g"))


def benchmark_gram_set(bench: DataFrame, text_col: str, n: int = 8) -> DataFrame:
    """The union of distinct hashed n-grams over the benchmark corpus —
    the broadcast side of every contamination join. Column: ``__g``."""
    return (
        bench.select(F.explode(word_ngrams(F.col(text_col), n)).alias("__g"))
        .select(F.xxhash64(F.col("__g")).alias("__g"))
        .distinct()
    )


def contamination_scores(
    train: DataFrame,
    bench_grams: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-train-doc count of distinct n-grams that appear in the
    benchmark gram set: ``(id, n_overlap)``, one row per train doc with
    n_overlap >= 1. The bench side broadcasts; the count is a map-side-
    combined groupBy over (train id) — the corpus itself never
    shuffles."""
    tg = _gram_hashes(train, id_col, text_col, n)
    return (
        tg.join(F.broadcast(bench_grams), "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Return the train rows that survive decontamination: docs with
    fewer than ``min_overlap`` distinct n-grams shared with the
    benchmark corpus. A left-anti join against the (broadcastable)
    contaminated-id set — the survivors keep their full row, untouched
    and unshuffled."""
    grams = benchmark_gram_set(bench, text_col, n)
    bad = (
        contamination_scores(train, grams, id_col, text_col, n)
        .filter(F.col("n_overlap") >= min_overlap)
        .select(id_col)
    )
    return train.join(F.broadcast(bad), id_col, "left_anti")
