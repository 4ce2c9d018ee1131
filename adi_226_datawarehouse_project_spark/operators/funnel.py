"""Ordered conversion funnels over event streams.

"Of the users who did A, how many later did B, then C?" — the product-
analytics staple (and, over pipeline telemetry, the same query answers
stage-conversion questions for a curation pipeline). Semantics follow
the strict-order convention: a user reaches step k at the EARLIEST
event of type k that is at-or-after their step-(k-1) reach time
(ties inclusive — for funnels that repeat the same event type in
consecutive steps, at-or-after lets one event satisfy both steps;
dedupe upstream if that matters), optionally within
``max_window_seconds`` of their step-1 time.

Spark-first shape, one pass per step:

    u1 = events[type=s1].groupBy(user).min(ts)
    uk = events[type=sk] ⋈ u(k-1) on user, ts >= t(k-1) → min(ts)

Each pass is an equi-join on the user key plus a map-side-combinable
MIN — partitioned by user, no window over the event stream, no UDF.
Funnels are short (k ≤ ~8), so k chained shuffles on the same key is
the whole cost; at 100 TB each join can reuse the same user-hash
partitioning (Spark reuses a matching exchange). The final summary is
k 1-row aggregates unioned and lagged — the only single-partition
window is over k rows.

Determinism: all time comparisons happen in INTEGER microseconds
(``unix_micros`` / DuckDB ``epoch_us``) — no float timestamp
arithmetic anywhere, so reach sets are exact on any engine.
Conversion ratios divide two exact integers once and are
floor-rounded portably (``floor(x*1e6 + 0.5)/1e6`` — see
operators/gapfill.py for why engine-native round() is not
reproducible on exact ties).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversion_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_window_seconds: int | None = None,
) -> DataFrame:
    """Per-step reach counts and conversion rates for an ordered funnel.

    Returns one row per step: ``step`` (1-based), ``step_name``,
    ``n_users`` reached, ``conv_from_prev`` and ``conv_from_first``
    (6-dp portable rounding; step 1 reports 1.0 for both, and a step
    with an empty predecessor cohort reports NULL rates).
    """
    if not steps:
        raise ValueError("steps must be non-empty")

    ev = events.select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.col(type_col).alias("__t"),
    )

    cur = (
        ev.where(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__us").alias("__reach"))
    )
    if max_window_seconds is not None:
        cur = cur.withColumn(
            "__deadline", F.col("__reach") + F.lit(max_window_seconds * 1_000_000)
        )
    reached = [cur]
    for s in steps[1:]:
        nxt = ev.where(F.col("__t") == s).alias("e")
        prev = cur.alias("p")
        cond = (F.col("e.__u") == F.col("p.__u")) & (
            F.col("e.__us") >= F.col("p.__reach")
        )
        if max_window_seconds is not None:
            cond = cond & (F.col("e.__us") <= F.col("p.__deadline"))
        joined = nxt.join(prev, cond).select(
            F.col("e.__u").alias("__u"),
            F.col("e.__us").alias("__us"),
            *(
                [F.col("p.__deadline").alias("__deadline")]
                if max_window_seconds is not None
                else []
            ),
        )
        aggs = [F.min("__us").alias("__reach")]
        if max_window_seconds is not None:
            # the deadline is constant per user; MIN just carries it
            aggs.append(F.min("__deadline").alias("__deadline"))
        cur = joined.groupBy("__u").agg(*aggs)
        reached.append(cur)

    counts = [
        df.agg(
            F.lit(i + 1).alias("step"),
            F.lit(name).alias("step_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )
        for i, (name, df) in enumerate(zip(steps, reached))
    ]
    summary = reduce(DataFrame.unionByName, counts)

    w = Window.orderBy("step")
    prev_n = F.lag("n_users").over(w)
    first_n = F.first("n_users").over(w)

    from ..functions.rounding import round6

    def _ratio(num, den):
        raw = num.cast("double") / den.cast("double")
        return F.when(den > 0, round6(raw))

    return summary.select(
        "step",
        "step_name",
        "n_users",
        F.when(F.col("step") == 1, F.lit(1.0))
        .otherwise(_ratio(F.col("n_users"), prev_n))
        .alias("conv_from_prev"),
        F.when(F.col("step") == 1, F.lit(1.0))
        .otherwise(_ratio(F.col("n_users"), first_n))
        .alias("conv_from_first"),
    ).orderBy("step")
