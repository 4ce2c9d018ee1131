"""Incremental left-anti upsert — the reference's warehouse loading
pattern (`nyc_hybrid_etl_pipeline.py:98-101,141-223`: INSERT … LEFT
JOIN target WHERE target.pk IS NULL / NOT EXISTS).

Spark-native form: ``left_anti`` join + append. Idempotent by
construction — running it twice adds zero rows (tested).

Scale posture: the anti-join shuffles on the key unless the existing
key set is small enough to broadcast; callers loading a big fact
against a huge existing fact should pass ``broadcast_existing=False``
(sort-merge anti-join) and rely on AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    broadcast_existing: bool = False,
) -> DataFrame:
    """Rows of `incoming` whose `keys` are absent from `existing`,
    appended to `existing` (returns the unioned DataFrame; callers
    persist it with an append write).

    The anti-join is NULL-SAFE (`<=>`): a plain equality anti-join
    never matches NULL=NULL, so a NULL-key row (dirty staging data)
    would be re-appended on EVERY run — breaking the idempotency this
    operator promises. Duplicate keys WITHIN one incoming batch all
    insert, faithful to the reference's INSERT … NOT EXISTS (both
    duplicates pass the non-existence test against the target);
    dedupe upstream if single-row-per-key matters."""
    target_keys = existing.select(*keys).dropDuplicates(keys)
    if broadcast_existing:
        target_keys = F.broadcast(target_keys)
    cond = None
    for k in keys:
        c = incoming[k].eqNullSafe(target_keys[k])
        cond = c if cond is None else (cond & c)
    new_rows = incoming.join(target_keys, on=cond, how="left_anti")
    return existing.unionByName(new_rows.select(*existing.columns))
