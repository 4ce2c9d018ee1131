"""As-of (temporal point-in-time) join — a custom operator Spark's
DataFrame API lacks natively (beyond-reference addition; the reference
is batch-equi-join only, `SURVEY.md` §2.3).

Semantics: for every left row, attach the single most recent right row
whose timestamp is ≤ the left row's timestamp, per key — the classic
trade/quote, event/attribution lookup.

Implementation is a *composition of built-in operators* (the preferred
strategy for custom operators): tag both sides, union them, and run one
``last(..., ignorenulls=True)`` window per key ordered by (ts, side) —
right rows sort before left rows at equal timestamps, so an exact-tie
right row IS visible to the left row, matching DuckDB/pandas
``merge_asof`` backward semantics.

Scale posture: exactly ONE hash-partition shuffle on the key (the
window), no broadcast of either side, no UDF, arbitrary key
cardinality; skewed keys are split by AQE. This beats the common
range-join formulation (left ⋈ right on key AND r.ts <= l.ts, then
max-per-left dedup), whose intermediate blows up quadratically on hot
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts: str,
    right_value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    ``right[ts] <= left[ts]`` sharing the ``by`` key (NULLs when no
    such row exists).

    Right payload columns come back as ``{prefix}{col}`` plus
    ``{prefix}{ts}`` (the matched right timestamp). Ties inside the
    right side at identical (key, ts) are broken by the LAST of
    ``right_value_cols`` ordering — pass a unique id column last for
    full determinism.
    """
    rpay = F.struct(F.col(ts), *[F.col(c) for c in right_value_cols])
    rt = right.select(
        *by,
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rpay.alias("__rpay"),
    )
    lt = left.select(
        *by,
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rt.schema["__rpay"].dataType).alias("__rpay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lpay"),
    )
    unioned = rt.withColumn("__lpay", F.lit(None).cast(lt.schema["__lpay"].dataType)).unionByName(lt)
    # __rpay joins the ORDER BY so right-side ties at identical
    # (key, ts) resolve by struct comparison of (ts, *right_value_cols)
    # — deterministic, matching the documented contract (left rows all
    # carry NULL __rpay, where the tiebreak is irrelevant: each left
    # row emits its own output row).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rpay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__asof", F.last("__rpay", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1).select(
        *[F.col(f"__lpay.{c}").alias(c) for c in left.columns],
        F.col(f"__asof.{ts}").alias(f"{prefix}{ts}"),
        *[F.col(f"__asof.{c}").alias(f"{prefix}{c}") for c in right_value_cols],
    )
    return out
