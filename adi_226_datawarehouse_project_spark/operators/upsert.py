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
    dedupe upstream if single-row-per-key matters.

    Both sides are ALIASED before the condition is built: `incoming`
    routinely shares lineage with `existing` (both derived from the
    same staging frame), and DataFrame-attribute refs
    (``incoming[k] == target_keys[k]``) resolve against expression
    ids that a shared plan can make ambiguous or trivially
    self-referential; alias-qualified ``F.col`` refs resolve by
    subtree, which is robust under self-joins."""
    inc = incoming.alias("__upsert_in")
    tgt = existing.select(*keys).dropDuplicates(keys).alias("__upsert_tgt")
    if broadcast_existing:
        tgt = F.broadcast(tgt)
    cond = None
    for k in keys:
        c = F.col(f"__upsert_in.{k}").eqNullSafe(F.col(f"__upsert_tgt.{k}"))
        cond = c if cond is None else (cond & c)
    new_rows = inc.join(tgt, on=cond, how="left_anti")
    return existing.unionByName(new_rows.select(*existing.columns))
