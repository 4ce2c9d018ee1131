"""Incremental rollup maintenance — keep a pre-aggregated gold table
(the reference's analytics layer) in sync with appended facts WITHOUT
rescanning history: ``new_rollup = merge(old_rollup, agg(delta))``.
Valid for exactly the algebraic aggregates whose partial states merge:

    count  → sum of counts          min/max → min/max of partials
    sum    → sum of sums            distinct → HLL sketch UNION
                                               (`operators.sketches`)

``avg`` is derived (sum/count) at READ time — storing it would make
the rollup non-mergeable, the classic materialized-view mistake.
COUNT(DISTINCT) is the interesting one: exact distinct does NOT merge
(yesterday's distinct count + today's double-counts returning keys),
which is precisely what the stored HLL sketch column solves — merge
the sketches, estimate at read.

At 100 TB this is the difference between a nightly gold refresh that
aggregates ONE day and one that rescans three years; the merge itself
shuffles only rollup-grain rows (dims × small). The fold is
associative and replay-idempotent when deltas carry a batch id the
caller dedupes on (the CDC/upsert sinks' policy); pinned against full
recompute in tests/test_rollup_maintenance.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import _DEFAULT_LG_K


def rollup_delta(
    facts: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    lg_k: int = _DEFAULT_LG_K,
) -> DataFrame:
    """Aggregate one fact slice into mergeable partial state:
    ``n_rows`` + ``sum_<c>`` / ``min_<c>`` / ``max_<c>`` +
    ``sketch_<c>`` (HLL binary) per group. Run it on the DELTA only —
    and once on the historical backfill to seed the rollup."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in (sum_cols or [])]
    # per-measure non-null count: F.sum skips NULLs, so the derived
    # avg must divide by the rows that actually contributed, not
    # n_rows — else NULL measures silently drag the average down
    aggs += [
        F.count(c).cast("bigint").alias(f"cnt_{c}") for c in (sum_cols or [])
    ]
    aggs += [F.min(c).alias(f"min_{c}") for c in (min_cols or [])]
    aggs += [F.max(c).alias(f"max_{c}") for c in (max_cols or [])]
    aggs += [
        F.hll_sketch_agg(F.col(c), lg_k).alias(f"sketch_{c}")
        for c in (distinct_cols or [])
    ]
    return facts.groupBy(*group_cols).agg(*aggs)


def merge_rollups(
    old: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Fold a delta rollup into the stored rollup: groups are unioned
    and partial states merged column-by-column (schema-driven — any
    ``sum_*``/``min_*``/``max_*``/``sketch_*``/``n_rows`` layout from
    :func:`rollup_delta` works). Associative: merging day-by-day or
    all-at-once yields the same table — EXACTLY for integer/decimal
    ``sum_`` measures, sketches (set-union), min/max and counts; for
    DOUBLE ``sum_`` measures the sums are equal only up to float
    summation order (keep measures in integer units, the repo
    convention, when bit-reproducibility across merge schedules
    matters). Sketches built at different ``lg_k`` merge fine
    (``allowDifferentLgConfigK``; the smaller k's accuracy wins)
    instead of aborting the nightly refresh."""
    # Back-compat: rollups persisted before cnt_<c> partials existed
    # lack them — synthesize cnt_<c> := n_rows on the legacy side (its
    # historical avg semantics: every row assumed to have contributed),
    # so an old stored rollup keeps merging with new deltas instead of
    # failing the nightly refresh.
    def _with_legacy_cnts(df: DataFrame, other: DataFrame) -> DataFrame:
        for c in other.columns:
            if (
                c.startswith("cnt_")
                and c not in df.columns
                and f"sum_{c[len('cnt_'):]}" in df.columns
            ):
                df = df.withColumn(c, F.col("n_rows"))
        return df  # a cnt_ with no matching sum_ falls through to the
        # schemas-differ check below — that's a genuine mismatch

    old = _with_legacy_cnts(old, delta)
    delta = _with_legacy_cnts(delta, old)
    if set(old.columns) != set(delta.columns):
        raise ValueError(
            f"rollup schemas differ: {sorted(old.columns)} vs {sorted(delta.columns)}"
        )
    merged = old.unionByName(delta)
    aggs = []
    for c in old.columns:
        if c in group_cols:
            continue
        if c == "n_rows" or c.startswith("sum_") or c.startswith("cnt_"):
            aggs.append(F.sum(c).alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        elif c.startswith("sketch_"):
            aggs.append(
                F.hll_union_agg(F.col(c), allowDifferentLgConfigK=True).alias(c)
            )
        else:
            raise ValueError(f"non-mergeable rollup column: {c!r}")
    return merged.groupBy(*group_cols).agg(*aggs)


def read_rollup(rollup: DataFrame) -> DataFrame:
    """Reader view: sketches become ``distinct_<c>`` estimates, and
    derived ``avg_<c>`` columns appear for every ``sum_<c>`` —
    sum/cnt_<c> (the per-measure NON-NULL count, matching true
    ``AVG``'s NULL-skipping), computed at read, never stored. Rollups
    written before cnt_ columns existed fall back to n_rows."""
    out = rollup
    cols = set(rollup.columns)
    for c in rollup.columns:
        if c.startswith("sketch_"):
            out = out.withColumn(
                f"distinct_{c[len('sketch_'):]}",
                F.hll_sketch_estimate(F.col(c)),
            ).drop(c)
        elif c.startswith("sum_"):
            measure = c[len("sum_"):]
            denom = f"cnt_{measure}" if f"cnt_{measure}" in cols else "n_rows"
            out = out.withColumn(
                f"avg_{measure}",
                F.col(c).cast("double") / F.nullif(F.col(denom), F.lit(0)),
            )
    return out
