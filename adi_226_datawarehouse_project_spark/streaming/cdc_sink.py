"""Streaming CDC sink: ``foreachBatch`` + :func:`operators.cdc.
latest_changes` — a continuously-maintained latest-wins table snapshot
from an insert/update/delete change stream. Completes the
incremental-load family: ``upsert_sink`` is insert-only (the
reference's NOT EXISTS loads), this one folds full Debezium-style
change events including updates and deletes.

Correctness across batches — the part naive foreachBatch merges get
wrong — requires the snapshot to REMEMBER two things:

- each row's winning ``seq``: otherwise a late (stale, lower-seq)
  change arriving in a later micro-batch would overwrite newer state
  folded earlier;
- delete TOMBSTONES (the ``D`` row, kept in the stored snapshot):
  otherwise a stale update arriving after the delete would resurrect
  the key. Readers go through :func:`read_cdc_snapshot`, which hides
  tombstones; compact them away only once the source can no longer
  deliver seqs below the tombstone's (retention watermark).

With those two, each batch fold is just ``latest_changes`` over
(stored snapshot ∪ batch) — idempotent (replaying any batch, or the
whole source, changes nothing) and order-insensitive across batches.
Pinned in tests/test_cdc_stream.py including a full-source replay into
an already-folded target and a stale-update-after-delete probe.

The snapshot directory is swapped write-new-then-rename (the
``compact_table`` pattern) — a reader never sees a half-written
snapshot, and a crash before the first rename leaves the old snapshot
intact. The rename pair itself is not atomic; a crash between the two
renames parks the durable snapshot at ``__old``, and every entry point
runs :func:`_recover_snapshot` first to move it back, so the worst
case is re-folding the interrupted (idempotent) batch. On a
transactional table format this body becomes MERGE INTO; the streaming
graph does not change.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import latest_changes


def _recover_snapshot(path: str) -> None:
    """Crash recovery for the two-rename swap in :func:`_swap_in`: a
    crash between ``target→__old`` and ``__new→target`` leaves nothing
    at ``path`` while the last durable snapshot sits at ``__old``.
    Every entry point calls this first, so that window merely costs a
    re-fold of the interrupted batch (idempotent by design) instead of
    silently rebuilding state from one batch."""
    old = path.rstrip("/") + "__old"
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)


def _swap_in(merged: DataFrame, target_path: str) -> None:
    """Publish ``merged`` at ``target_path`` write-new-then-swap. The
    rename pair is not atomic — :func:`_recover_snapshot` closes the
    crash window between them."""
    tmp = target_path.rstrip("/") + "__new"
    merged.write.mode("overwrite").parquet(tmp)
    old = target_path.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(target_path):
        os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)


def _snapshot_exists(path: str) -> bool:
    _recover_snapshot(path)
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def read_cdc_snapshot(spark: SparkSession, target_path: str, op_col: str = "op") -> DataFrame:
    """The live table view: stored snapshot minus tombstones and
    bookkeeping columns."""
    _recover_snapshot(target_path)
    snap = spark.read.parquet(target_path)
    return snap.filter(F.col(op_col) != "D").drop(op_col)


def apply_cdc_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    target_path: str,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> None:
    """Fold one micro-batch of change events into the stored snapshot
    at ``target_path`` (write-new-then-swap). The stored snapshot keeps
    the full change schema (incl. ``seq_col`` and ``op_col``
    tombstones) — see module docstring for why."""
    if _snapshot_exists(target_path):
        base = spark.read.parquet(target_path)
        everything = base.unionByName(batch_df)
    else:
        everything = batch_df
    merged = latest_changes(everything, keys, seq_col, op_col)
    _swap_in(merged, target_path)


def stream_cdc_apply(
    spark: SparkSession,
    changes_path: str,
    target_path: str,
    checkpoint_path: str,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
    max_files_per_trigger: int = 1,
) -> None:
    """Drive one full pass of a parquet change-event stream into the
    CDC snapshot (blocks until the source is drained)."""
    schema = spark.read.parquet(changes_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(changes_path)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _epoch: apply_cdc_batch(
                spark, bdf, target_path, keys, seq_col, op_col
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_tombstones(
    spark: SparkSession,
    target_path: str,
    retention_seq: int,
    seq_col: str,
    op_col: str = "op",
) -> int:
    """Drop tombstones whose seq is at or below ``retention_seq`` —
    the retention watermark below which the source can no longer
    deliver events (e.g. the replication slot's confirmed LSN). A
    tombstone above the watermark must stay: a stale update for its
    key may still arrive and needs to lose. Rewrites the snapshot
    write-new-then-swap; returns the number of tombstones removed."""
    _recover_snapshot(target_path)
    snap = spark.read.parquet(target_path)
    keep = snap.filter(
        (F.col(op_col) != "D") | (F.col(seq_col) > F.lit(retention_seq))
    )
    removed = snap.count() - keep.count()
    if removed:
        _swap_in(keep, target_path)
    return removed
