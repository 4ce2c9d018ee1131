"""Time-series gap filling: spine densification + LOCF + linear interpolation.

The warehouse's event streams are sparse: a (series, hour) bucket exists
only when at least one event landed in it. Downstream consumers (rate
dashboards, training-feature windows, anomaly baselines) want a DENSE
series — one row per hour per series between that series' first and
last observation — with the holes filled by last-observation-carried-
forward and/or linear interpolation. Classic warehouse gap-fill (the
reference's notebooks resample pandas frames with `asfreq`/`interpolate`;
here the same semantics are a pure DataFrame plan).

Scale design (100 TB):

- The spine is generated per series with ``sequence(h0, h1)`` +
  ``explode`` — a narrow generator, no shuffle, no driver loop. Output
  rows = sum of per-series spans, never a cross join.
- All fills are windows PARTITIONED BY the series key. Parallelism is
  the series cardinality: per-device/per-user keys give millions of
  independent partitions. A LOW-cardinality series key (like the demo
  query's 16 rollup groups) concentrates each series in one task — fine
  for rollup-grade series counts, wrong for per-device fill; pick the
  key accordingly (the operator is agnostic).
- LOCF/interpolation use the portable "observation group" trick —
  ``grp = COUNT(value) OVER (ORDER BY hour)`` then MIN/MAX over
  ``(series, grp)`` — instead of ``last(..., ignoreNulls=True)``, so the
  very same window algebra runs on any ANSI engine (the DuckDB oracle
  uses the identical formulation) and never needs IGNORE NULLS support.
- Values are carried as integer micro-units (``round(v * 1e6)`` summed
  as BIGINT) so bucket averages and interpolation are exact integer /
  small-rational arithmetic — bit-identical across engines and across
  partition orderings, per the repo-wide oracle-comparability
  convention (dialect.py module docstring).

Long spines: ``sequence`` materializes one array per series row; a
multi-year hourly spine is ~10⁴ elements (fine), but a per-second spine
over years (~10⁸) would need the span chunked first (split [h0, h1]
into bounded slices, explode twice). The operator raises on spans past
a configurable ceiling rather than silently building giant arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICROS = 1_000_000

# sequence() builds an in-memory array per series row; beyond ~1M slots
# the per-row allocation (not the plan shape) becomes the hazard. Chunk
# the span upstream if a series legitimately exceeds this.
MAX_SPAN_SLOTS_DEFAULT = 1_000_000


def hourly_observations(
    events: DataFrame,
    series: Column,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Sparse (series_id, bucket_hour) aggregate of an event stream.

    ``v_units`` is the bucket SUM in integer micro-units; ``n_obs`` the
    contributing event count — both exact, so ``avg = v_units / n_obs``
    is reproducible on any engine regardless of row order.
    """
    hour = F.floor(F.col(ts_col).cast("double") / 3600).cast("bigint")
    return (
        events.select(
            series.alias("series_id"),
            hour.alias("bucket_hour"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("series_id", "bucket_hour")
        .agg(
            F.sum(F.round(F.col("__v") * MICROS, 0).cast("bigint")).alias("v_units"),
            F.count("__v").alias("n_obs"),
        )
    )


def gap_fill_interpolate(
    obs: DataFrame,
    series_col: str = "series_id",
    hour_col: str = "bucket_hour",
    units_col: str = "v_units",
    n_obs_col: str = "n_obs",
    max_span_slots: int = MAX_SPAN_SLOTS_DEFAULT,
) -> DataFrame:
    """Densify a sparse hourly series and fill the holes.

    For every series, emits one row per hour in ``[min(hour),
    max(hour)]`` with:

    - ``n_obs``: 0 on filled rows;
    - ``v``: the observed bucket average (NULL on gaps);
    - ``locf_v``: last observation carried forward (on an observed row,
      itself; never NULL because the spine starts at an observation);
    - ``interp_v``: linear interpolation between the surrounding
      observations (equals ``v`` on observed rows). Every gap row has
      BOTH neighbors by construction — the spine is bounded by the
      series' first and last observations — so no edge fallback
      exists or is needed.

    All three are rounded to 6 decimals with the PORTABLE rounding
    ``floor(x * 1e6 + 0.5) / 1e6`` — engine-native ``round(x, 6)`` is
    not reproducible on exact half-way ties (Spark rounds the shortest
    decimal form HALF_UP, DuckDB rounds the binary double), and
    interpolation of micro-unit rationals DOES produce exact ties. The
    floor form is the same IEEE op sequence on every engine, so the
    DuckDB oracle agrees bitwise.
    """
    s, h = series_col, hour_col

    # A bucket whose events ALL had NULL values (v_units NULL, n_obs 0)
    # is not an observation: counted into the span it would anchor the
    # spine at a row with nothing to carry or interpolate from, and the
    # leading/trailing fills would come out NULL — breaking the
    # "locf_v never NULL / every gap has both neighbors" contract.
    # Treat such buckets as gaps (they re-enter via the dense spine).
    obs = obs.filter(F.col(units_col).isNotNull())

    span = obs.groupBy(s).agg(F.min(h).alias("__h0"), F.max(h).alias("__h1"))
    guard = (
        F.when(
            F.col("__h1") - F.col("__h0") < max_span_slots, F.col("__h1")
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "gap_fill_interpolate: series span exceeds "
                        f"{max_span_slots} slots for series "
                    ),
                    F.col(s).cast("string"),
                    F.lit(" — chunk the span upstream"),
                )
            ).cast("bigint")
        )
    )
    spine = span.select(
        F.col(s), F.explode(F.sequence(F.col("__h0"), guard)).alias(h)
    )

    joined = spine.join(obs, on=[s, h], how="left")

    asc = Window.partitionBy(s).orderBy(F.col(h).asc())
    desc = Window.partitionBy(s).orderBy(F.col(h).desc())
    v = F.col(units_col)
    with_grp = joined.select(
        s, h, units_col, n_obs_col,
        F.count(v).over(asc).alias("__grp"),
        F.count(v).over(desc).alias("__grp2"),
    )

    # Each (series, __grp) partition is [observation row, its trailing
    # gap rows]; (series, __grp2) is [its leading gap rows, observation
    # row]. MIN/MAX over those partitions recover the neighbors without
    # IGNORE NULLS.
    prev_w = Window.partitionBy(s, "__grp")
    next_w = Window.partitionBy(s, "__grp2")
    filled = with_grp.select(
        s, h, units_col, n_obs_col,
        F.max(v).over(prev_w).alias("__prev_units"),
        F.max(F.when(v.isNotNull(), F.col(n_obs_col))).over(prev_w).alias("__prev_n"),
        F.min(F.when(v.isNotNull(), F.col(h))).over(prev_w).alias("__prev_h"),
        F.max(v).over(next_w).alias("__next_units"),
        F.max(F.when(v.isNotNull(), F.col(n_obs_col))).over(next_w).alias("__next_n"),
        F.max(F.when(v.isNotNull(), F.col(h))).over(next_w).alias("__next_h"),
    )

    obs_avg = v.cast("double") / F.col(n_obs_col)
    prev_avg = F.col("__prev_units").cast("double") / F.col("__prev_n")
    next_avg = F.col("__next_units").cast("double") / F.col("__next_n")
    frac = (F.col(h) - F.col("__prev_h")).cast("double") / (
        F.col("__next_h") - F.col("__prev_h")
    ).cast("double")
    # No NULL-neighbor branches: spine endpoints are observations, so
    # a gap row always has both a previous and a next observation.
    interp = F.when(v.isNotNull(), obs_avg).otherwise(
        prev_avg + (next_avg - prev_avg) * frac
    )

    from ..functions.rounding import round6 as _round6

    return filled.select(
        F.col(s),
        F.col(h),
        F.coalesce(F.col(n_obs_col), F.lit(0)).cast("bigint").alias("n_obs"),
        _round6(obs_avg / MICROS).alias("v"),
        _round6(prev_avg / MICROS).alias("locf_v"),
        _round6(interp / MICROS).alias("interp_v"),
    )
