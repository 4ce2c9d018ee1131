"""Stored mergeable sketches — the incremental-rollup pattern every
MPP warehouse grows into: materialize a small SKETCH per grain (day,
source, shard) once, then answer distinct-count questions over ANY
combination of grains by merging sketches — never rescanning the raw
data. The reference's COUNT(DISTINCT …) analytics (A1/A6) recompute
from base rows per query; at 100 TB a daily distinct-users query over
a year becomes 365 sketch merges over kilobytes.

Built on Spark's Apache DataSketches HLL functions (``hll_sketch_agg``
/ ``hll_union_agg`` / ``hll_sketch_estimate``, Spark ≥ 3.5):

- sketches are BINARY columns — write them to parquet like any other
  column; a day's sketch is built exactly once, when the partition
  lands;
- merge is associative + commutative, so rollups compose (day →
  month → arbitrary ad-hoc ranges) and late data just re-merges its
  grain;
- ``lg_k`` trades size for accuracy (default 12 ≈ 1.6% rel. std
  error, ~2-8 KB per sketch).

Error-vs-exact legality is pinned in tests/test_sketches.py at
multiple cardinalities; `op_approx_vs_exact` already pins the
session-level HLL++ (`approx_count_distinct`) tolerance — these are
the STORED, re-mergeable complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_LG_K = 12


def build_sketches(
    df: DataFrame,
    grain_cols: list[str],
    value_col: str,
    sketch_col: str = "sketch",
    lg_k: int = _DEFAULT_LG_K,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per grain
    group: ``(grain..., sketch binary, n_rows)``. Map-side combinable
    single aggregation — the same shuffle as the plain groupBy count
    it rides along with."""
    # Native Column functions, not f-string F.expr: Column args handle
    # any column name (spaces, dots) without quoting/injection hazards.
    return df.groupBy(*grain_cols).agg(
        F.hll_sketch_agg(F.col(value_col), lg_k).alias(sketch_col),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketches(
    sketches: DataFrame,
    by_cols: list[str] | None = None,
    sketch_col: str = "sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Merge stored sketches up to a coarser grain (or to one row when
    ``by_cols`` is empty/None) and estimate the distinct count:
    ``(by..., distinct_estimate[, n_rows])``. Only sketches move —
    kilobytes per input group, never base rows.

    Mixed ``lg_k`` inputs union fine (``allowDifferentLgConfigK`` —
    the result takes the smaller k's accuracy): sketch families built
    at different precisions over time must merge, not abort the
    nightly refresh. ``n_rows`` is summed only when present, so a
    pared-down (grain, sketch) projection from an external writer
    still merges."""
    by_cols = by_cols or []
    agg = [
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), allowDifferentLgConfigK=True)
        ).alias(estimate_col)
    ]
    if "n_rows" in sketches.columns:
        agg.append(F.sum("n_rows").alias("n_rows"))
    if by_cols:
        return sketches.groupBy(*by_cols).agg(*agg)
    return sketches.agg(*agg)


def estimate_per_group(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Per-stored-grain estimates without any merge (narrow)."""
    return sketches.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    max_items_tracked: int | None = None,
    by_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate top-k most frequent values (``approx_top_k`` — a
    bounded-memory frequent-items sketch): ``(by..., item, est_count,
    rank)``. The exact formulation is a full groupBy count + top-k
    window over EVERY distinct value; the sketch tracks
    ``max_items_tracked`` (default 10·k) candidates per group in fixed
    memory — the difference between profiling a 100 TB column and
    materializing its whole distinct distribution. Estimates are exact
    whenever the column's distinct count fits the tracked budget, and
    within the sketch's collapse error otherwise (envelope pinned in
    tests/test_sketches.py on a Zipf-ish distribution)."""
    # `is None`, not `or`: max_items_tracked=0 is an invalid budget the
    # caller should hear about from approx_top_k, not a silent default.
    tracked = 10 * k if max_items_tracked is None else max_items_tracked
    by_cols = by_cols or []
    agg = F.expr(f"approx_top_k({value_col}, {k}, {tracked})").alias("__top")
    grouped = df.groupBy(*by_cols).agg(agg) if by_cols else df.agg(agg)
    return grouped.select(
        *by_cols, F.posexplode("__top").alias("__rank", "__s")
    ).select(
        *by_cols,
        F.col("__s.item").alias("item"),
        F.col("__s.count").alias("est_count"),
        (F.col("__rank") + 1).alias("rank"),
    )
