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
renames leaves the committed merge at ``__new`` and the previous
snapshot at ``__old``. WRITE paths (apply/compact — serialized by
foreachBatch) run :func:`_recover_snapshot` first to finish or unwind
the swap; READ paths stay side-effect-free and resolve the right
directory via :func:`_read_path`, so a concurrent reader can never
race an in-flight writer swap. Worst case is re-folding the
interrupted (idempotent) batch. On a transactional table format this
body becomes MERGE INTO; the streaming graph does not change.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import latest_changes


def _recover_snapshot(path: str) -> None:
    """WRITER-side crash recovery for the two-rename swap in
    :func:`_swap_in`: a crash between ``target→__old`` and
    ``__new→target`` leaves nothing at ``path``, the COMMITTED merge at
    ``__new`` (its parquet write finished before any rename started)
    and the previous snapshot at ``__old``. Promote ``__new`` when it
    committed (the fold it holds is idempotent — a checkpoint replay of
    the same batch changes nothing), else fall back to ``__old``.

    Called only from the write path (apply/compact), which foreachBatch
    serializes — READERS must stay side-effect-free (see
    :func:`_read_path`) or a reader's rename races the writer's swap
    and fails its ``__new→target`` rename."""
    if os.path.isdir(path):
        return
    new = path.rstrip("/") + "__new"
    old = path.rstrip("/") + "__old"
    if os.path.isdir(new) and os.path.exists(os.path.join(new, "_SUCCESS")):
        os.rename(new, path)
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.isdir(old):
        os.rename(old, path)


def _read_path(path: str) -> str:
    """Side-effect-free reader view of the swap state: the directory a
    reader should load — ``target`` normally, the committed ``__new``
    or parked ``__old`` inside the crash window. Never renames, so
    concurrent readers cannot race an in-flight writer swap."""
    if os.path.isdir(path):
        return path
    new = path.rstrip("/") + "__new"
    if os.path.isdir(new) and os.path.exists(os.path.join(new, "_SUCCESS")):
        return new
    old = path.rstrip("/") + "__old"
    if os.path.isdir(old):
        return old
    return path


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
    bookkeeping columns. Reads through :func:`_read_path`, so a crash
    window is readable WITHOUT mutating the swap state."""
    snap = spark.read.parquet(_read_path(target_path))
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
