"""SCD Type-2 dimension apply — the versioned-dimension merge every
warehouse needs and the reference's dims silently lack (its upserts,
`nyc_hybrid_etl_pipeline.py:141-180`, are insert-only: attribute
changes never create versions).

Set-based formulation (no row-at-a-time logic, the reference's own
"set-based SQL" principle `README.md:181`):

  changed    = current rows whose incoming attr differs
  closed     = changed rows with effective_to := batch_date, current=F
  reopened   = one new current version per changed key
  brand_new  = incoming keys absent from the dimension
  untouched  = everything else, carried as-is

All four legs are joins/anti-joins on the business key — shuffle-
partitioned on one key, broadcastable when the update batch is small
(the common nightly case); applying the same batch twice is a no-op
(idempotent, tested), because the second pass sees attr equality.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAR_FUTURE = _dt.date(9999, 12, 31)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attr: str,
    batch_date: _dt.date,
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension.

    `dim` columns: key, attr, effective_from, effective_to, is_current.
    `updates` columns: key, attr. Returns the new full dimension.
    """
    upd = updates.select(F.col(key), F.col(attr).alias("__new_attr"))
    current = dim.filter(F.col("is_current"))

    # Null-safe inequality: transitions to/from NULL are real attribute
    # changes and must close/open versions (plain != would drop them).
    changed_keys = (
        current.join(upd, key)
        .filter(~F.col(attr).eqNullSafe(F.col("__new_attr")))
        .select(key, "__new_attr")
    )
    closed = (
        current.join(changed_keys.select(key), key, "semi")
        .withColumn("effective_to", F.lit(batch_date))
        .withColumn("is_current", F.lit(False))
    )
    reopened = changed_keys.select(
        F.col(key),
        F.col("__new_attr").alias(attr),
        F.lit(batch_date).alias("effective_from"),
        F.lit(FAR_FUTURE).alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    brand_new = (
        upd.join(dim.select(key).distinct(), key, "left_anti")
        .select(
            F.col(key),
            F.col("__new_attr").alias(attr),
            F.lit(batch_date).alias("effective_from"),
            F.lit(FAR_FUTURE).alias("effective_to"),
            F.lit(True).alias("is_current"),
        )
    )
    untouched = dim.join(
        closed.select(key, "effective_from"), [key, "effective_from"], "left_anti"
    )
    cols = [key, attr, "effective_from", "effective_to", "is_current"]
    return (
        untouched.select(*cols)
        .unionByName(closed.select(*cols))
        .unionByName(reopened)
        .unionByName(brand_new)
    )


def as_of(dim: DataFrame, key: str, date: _dt.date) -> DataFrame:
    """Point-in-time view of the SCD2 dimension: the version of each
    key that was effective ON ``date`` — ``effective_from <= date <
    effective_to`` (half-open, matching :func:`scd2_apply`'s close
    rule: a version closed on D stops covering D, the replacement
    starts at D). Keys whose first version starts after ``date`` are
    absent — they did not exist yet. Pure narrow filter over the
    stored dimension; with the dimension partitioned/z-ordered on the
    date range at warehouse scale, the scan prunes to live files."""
    return dim.filter(
        (F.col("effective_from") <= F.lit(date))
        & (F.col("effective_to") > F.lit(date))
    ).drop("is_current")
