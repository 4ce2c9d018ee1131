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


def fuzzy_contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str | None = None,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_size: int = 5,
    shingle: str = "word",
    min_jaccard_est: float = 0.5,
) -> DataFrame:
    """FUZZY contamination detection: ``(train id, bench id,
    jaccard_est)`` for every train/bench pair whose MinHash-estimated
    shingle Jaccard reaches ``min_jaccard_est`` — the approximate
    complement of the exact n-gram overlap above. The two are
    complementary by construction: the exact detector needs an intact
    ``n``-gram (blind to benchmark items SHORTER than n words and to
    edits that break every long gram), while the resemblance detector
    scores whole-document shingle overlap and survives paraphrase-
    level perturbation — real data cards (GPT-3 §C, Llama) run both.

    Scale shape: both corpora get signatures from the SAME seeded
    xxhash64 family (``dedup.minhash_signatures``); the benchmark's
    band rows are tiny (eval sets are thousands of docs) and
    ``broadcast()``, so the training corpus streams through a map-side
    band join with zero corpus shuffle; candidates dedupe as bare id
    pairs before signatures re-attach for scoring (the
    ``minhash_near_dup_pairs`` pattern, cross-corpus).

    OPERATING POINT: contamination thresholds sit far lower than
    near-dup thresholds, so the banding defaults differ from dedup's
    64/16 — 32 bands × 2 rows gives candidate recall
    1−(1−J²)³² ≈ 0.996 at J=0.4 (vs ≈0.34 for 16×4), and the extra
    low-J candidates the looser bands admit die at the exact
    ``jaccard_est`` re-score, costing join width, not precision."""
    from .dedup import _band_rows, minhash_signatures

    bench_text = bench_text_col or text_col
    t_sig = minhash_signatures(
        train, id_col, text_col, num_hashes, shingle_size, shingle
    )
    b_sig = minhash_signatures(
        bench, bench_id_col, bench_text, num_hashes, shingle_size, shingle
    )
    t_bands = _band_rows(t_sig, id_col, num_hashes, bands).select(
        F.col(id_col).alias("__tid"), "band", "band_hash"
    )
    b_bands = _band_rows(b_sig, bench_id_col, num_hashes, bands).select(
        F.col(bench_id_col).alias("__bid"), "band", "band_hash"
    )
    cand = (
        t_bands.join(F.broadcast(b_bands), ["band", "band_hash"])
        .select("__tid", "__bid")
        .dropDuplicates(["__tid", "__bid"])
    )
    scored = (
        cand.join(
            t_sig.select(F.col(id_col).alias("__tid"), F.col("signature").alias("__sa")),
            "__tid",
        )
        .join(
            F.broadcast(
                b_sig.select(
                    F.col(bench_id_col).alias("__bid"), F.col("signature").alias("__sb")
                )
            ),
            "__bid",
        )
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("__sa"), F.col("__sb"), lambda a, b: (a == b).cast("int")),
            lambda x: x == 1,
        )
    )
    return (
        scored.withColumn(
            "jaccard_est", agree.cast("double") / F.lit(float(num_hashes))
        )
        .filter(F.col("jaccard_est") >= min_jaccard_est)
        .select(
            F.col("__tid").alias(id_col),
            F.col("__bid").alias(bench_id_col),
            "jaccard_est",
        )
    )


def fuzzy_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str | None = None,
    min_jaccard_est: float = 0.5,
    **minhash_kwargs,
) -> DataFrame:
    """Survivor form: drop every train doc that fuzzy-matches ANY
    benchmark doc at ``min_jaccard_est``. Same left-anti shape as
    :func:`decontaminate`; run BOTH for a production scrub."""
    bad = (
        fuzzy_contamination_pairs(
            train,
            bench,
            id_col,
            text_col,
            bench_id_col,
            bench_text_col,
            min_jaccard_est=min_jaccard_est,
            **minhash_kwargs,
        )
        .select(id_col)
        .distinct()
    )
    return train.join(F.broadcast(bad), id_col, "left_anti")
