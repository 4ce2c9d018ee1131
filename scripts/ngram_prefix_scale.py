"""Measure PPJoin prefix filtering vs the naive inverted-index
self-join for exact n-gram Jaccard on a stopword-hot corpus — the
adversarial shape behind the exact-mode α≈0.64 watch item.

Every doc shares a hot stopword head (all-pairs collision for the
naive join) plus a genuine variable-length tail; ~1% of docs get a
planted near-duplicate so the output is non-trivial. Both modes must
return identical pairs.

Usage::

    python scripts/ngram_prefix_scale.py [n_docs] [n_docs_2]
    python scripts/ngram_prefix_scale.py --crossover [n_docs]

``--crossover`` (VERDICT r8 #4): the auto-selector's constant
``_AUTO_PREFIX_CAND_PER_ROW`` (=32 expected candidate partners per
row) was justified only at the extremes — a uniform corpus (probe ≈1,
naive 2.7× cheaper at 256×) and a stopword-hot one (probe ≫ 32, prefix
α 1.07→0.21). The sweep drives a corpus FAMILY through the threshold:
docs share their hot head only within a GROUP of ``g`` docs, so the
hot-bigram document frequency is g and the probe reads
≈ h·g/s (h hot bigrams of s per doc). Sweeping g crosses 32 between
g≈64 and g≈256; at each point BOTH join strategies are timed and the
auto probe is recorded, so the output shows directly whether the
chosen mode is the cheaper one on each side of the constant.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from adi_226_datawarehouse_project_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
)
from adi_226_datawarehouse_project_spark.session import get_spark  # noqa: E402

SIZES = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [2_000, 8_000]
HOT = "the cat sat on the mat and the dog ran to the park"


def _corpus(spark, n):
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(HOT + " "),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"tok{j}x"), (F.xxhash64("id") % 1000 + j).cast("string"))
                    for j in range(12)
                ],
            ),
        ).alias("text"),
    )
    dups = (
        base.filter(F.col("doc_id") % 100 == 7)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    return base.unionByName(dups)


GROUPS = [1, 16, 64, 128, 256, 1024, 4096]


def _group_corpus(spark, n, g):
    """n docs; hot 6-token head shared within groups of g docs (df of a
    hot bigram ≈ g), plus a per-doc unique 12-token tail; ~1% planted
    near-dups inside the same group (so both modes return pairs)."""
    head_words = 6
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"hot{j}g"), (F.col("id") / g).cast("long").cast("string"))
                    for j in range(head_words)
                ],
            ),
            F.lit(" "),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"tok{j}x"), (F.xxhash64("id") % 1000 + j).cast("string"))
                    for j in range(12)
                ],
            ),
        ).alias("text"),
    )
    dups = (
        base.filter(F.col("doc_id") % 100 == 7)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    return base.unionByName(dups)


def crossover(n_docs: int) -> None:
    spark = get_spark(shuffle_partitions=32)
    out = []
    for g in GROUPS:
        docs = _group_corpus(spark, n_docs, g).persist()
        docs.count()
        stats: dict = {}
        # probe only (auto path) — run once, discard the frame
        ngram_jaccard_pairs(docs, "doc_id", "text", n=2, min_jaccard=0.8, _stats=stats)
        row = {"g": g, "cand_per_row": round(stats["cand_per_row"], 1),
               "auto": "prefix" if stats["prefix_filter"] else "naive"}
        for label, kw in [("naive", {"prefix_filter": False}),
                          ("prefix", {"prefix_filter": True})]:
            best, pairs = float("inf"), 0
            for _ in range(2):
                t0 = time.perf_counter()
                pairs = ngram_jaccard_pairs(
                    docs, "doc_id", "text", n=2, min_jaccard=0.8, **kw
                ).count()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 2)
            row[f"{label}_pairs"] = pairs
        assert row["naive_pairs"] == row["prefix_pairs"], "pair sets diverged!"
        row["cheaper"] = "naive" if row["naive"] <= row["prefix"] else "prefix"
        row["auto_correct"] = row["auto"] == row["cheaper"] or abs(
            row["naive"] - row["prefix"]
        ) < 0.15 * max(row["naive"], row["prefix"])  # tie zone
        print(f"# {row}", file=sys.stderr)
        out.append(row)
        docs.unpersist()
    import json

    print(json.dumps({"n_docs": n_docs, "sweep": out}))


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    out = {}
    for n in SIZES:
        docs = _corpus(spark, n).persist()
        docs.count()
        row = {}
        for label, kw in [
                ("naive", {"prefix_filter": False}),
                ("prefix", {"prefix_filter": True}),
            ]:
            best, pairs = float("inf"), 0
            for _ in range(2):
                t0 = time.perf_counter()
                pairs = ngram_jaccard_pairs(
                    docs, "doc_id", "text", n=2, min_jaccard=0.8, **kw
                ).count()
                best = min(best, time.perf_counter() - t0)
            row[label] = (round(best, 2), pairs)
            print(f"# n={n} {label}: {best:.2f}s pairs={pairs}", file=sys.stderr)
        assert row["naive"][1] == row["prefix"][1], "pair sets diverged!"
        out[n] = row
        docs.unpersist()
    if len(SIZES) == 2:
        import math

        k = SIZES[1] / SIZES[0]
        for label in ("naive", "prefix"):
            a = math.log(out[SIZES[1]][label][0] / out[SIZES[0]][label][0]) / math.log(k)
            print(f"# alpha[{label}] = {a:.2f}", file=sys.stderr)
    print({n: {k: v for k, v in row.items()} for n, row in out.items()})


if __name__ == "__main__":
    if "--crossover" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--crossover"]
        crossover(int(args[0]) if args else 8_000)
    else:
        main()
