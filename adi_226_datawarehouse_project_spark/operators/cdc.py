"""CDC (change-data-capture) apply — fold an insert/update/delete
change log into a table snapshot. The general form of the reference's
incremental-load family: its left-anti upsert (J2-J4,
`nyc_hybrid_etl_pipeline.py:141-223`) is insert-only CDC; SCD2
(`operators/scd.py`) is CDC with history; this operator is the
replace-in-place MERGE (Debezium/warehouse "apply changes" semantics)
without needing a transactional table format.

Semantics (latest-wins):

1. per key, only the change with the highest ``seq_col`` counts
   (ties break by operation precedence D > U > I then arbitrary-but-
   deterministic — sequence numbers SHOULD be unique per key; ties are
   a producer bug this operator refuses to amplify nondeterministically);
2. latest op ``D`` → the key disappears from the result;
3. latest op ``I``/``U`` → the key holds exactly the change row's
   columns (full-row image, Debezium "after" style);
4. keys untouched by the log pass through unchanged.

Properties pinned in tests/test_cdc.py: applying a batch twice ==
once (idempotent), applying two batches == applying their union
(associative fold), out-of-order arrival within a batch is harmless.

Scale shape: one shuffle by key for the per-key latest-change window
(partitioned window — never global), one left-anti + one union for the
merge; both sides stay columnar. At 100 TB you run this per partition
of a date-partitioned snapshot and rewrite only partitions whose keys
appear in the log (partition pruning on the change keys)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OPS = ("I", "U", "D")


def _hashable(dt: T.DataType) -> bool:
    """True when ``xxhash64`` accepts the type. MapType (at any
    nesting depth) is rejected by Spark's hash expressions unless the
    legacy conf is set, and raising at PLAN time over the tie-break —
    a defensive detail — would break change feeds with map payloads
    that folded fine before the tie-break existed."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def latest_changes(
    changes: DataFrame, keys: list[str], seq_col: str, op_col: str = "op"
) -> DataFrame:
    """Reduce a change log to one winning row per key (highest seq;
    D > U > I on seq ties; full-row hash as the final tie-break so the
    order is TOTAL — without it, two rows with equal (seq, op) but
    different payloads would win by shuffle arrival order, and a task
    retry or re-run could fold a different payload into the snapshot).
    Output keeps all change columns.

    The tie-break hashes only xxhash64-HASHABLE columns (maps are
    skipped, see ``_hashable``): for a feed whose payload rows differ
    ONLY in a map column the order is total per distinct hashable
    prefix — equal-(seq, op, hashable-cols) rows with different map
    payloads still fold arbitrarily, which such a producer must
    disambiguate via ``seq_col`` (the documented contract: sequence
    numbers SHOULD be unique per key)."""
    prec = (
        F.when(F.col(op_col) == "D", 2)
        .when(F.col(op_col) == "U", 1)
        .otherwise(0)
    )
    hashable_cols = [
        f.name for f in changes.schema.fields if _hashable(f.dataType)
    ]
    order = [F.col(seq_col).desc(), prec.desc()]
    if hashable_cols:
        order.append(F.xxhash64(*[F.col(c) for c in hashable_cols]).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Fold ``changes`` into ``base`` with latest-wins semantics (see
    module docstring). ``changes`` must carry every ``base`` column
    plus ``seq_col`` and ``op_col`` (full-row images); the result has
    exactly the ``base`` schema.

    Stale-delivery defense: when ``base`` itself carries ``seq_col``
    (a snapshot that retains it — the streaming sink's layout), the
    base row competes in the latest-wins window, so a late batch whose
    seq is OLDER than what is already folded loses instead of
    overwriting newer data. A base WITHOUT ``seq_col`` cannot defend
    itself: callers on that schema must apply batches in per-key seq
    order (a batch boundary must never interleave sequence numbers),
    or the "two batches == their union" property breaks."""
    missing = [c for c in base.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing base columns: {missing}")
    # row-level op-domain guard INSIDE the plan (no extra action): an
    # unknown op raises instead of being folded or dropped silently.
    # The predicate is load-bearing (it gates every change row), so
    # Catalyst cannot prune it away.
    checked = changes.filter(
        F.when(F.col(op_col).isin(list(_OPS)), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(F.lit("apply_cdc: unknown op value: "), F.col(op_col))
            ).cast("boolean")
        )
    )
    if seq_col in base.columns:
        # Seq-carrying snapshot: fold base rows into the same window as
        # the changes (op "I" — loses seq ties to a real D/U change),
        # exactly the streaming sink's defense (cdc_sink.apply_cdc_batch).
        everything = base.withColumn(op_col, F.lit("I")).unionByName(
            checked.select(*base.columns, op_col)
        )
        latest = latest_changes(everything, keys, seq_col, op_col)
        return latest.filter(F.col(op_col) != "D").select(*base.columns)
    latest = latest_changes(checked, keys, seq_col, op_col)
    upserts = latest.filter(F.col(op_col) != "D").select(*base.columns)
    untouched = base.join(latest.select(*keys), keys, "left_anti")
    return untouched.unionByName(upserts)
