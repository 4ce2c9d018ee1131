"""Custom JSONL sink with a commit-time manifest (Python DataSource
WRITER API) — completes the custom-source surface (batch read +
streaming read live in ``soda_datasource.py``). What the built-in JSON
writer cannot give you is a transactional COMMIT hook; this sink uses
it to implement the engine's manifest discipline at the protocol
level:

- each task writes its shard to ``part-<uuid>.jsonl.tmp`` and returns
  (filename, row count) as its commit message;
- ``commit`` — which runs exactly once, only after EVERY task
  succeeded — renames the tmp shards into place and writes
  ``_MANIFEST.json`` (shards + per-shard row counts + total) and the
  ``_SUCCESS`` zone marker the pipelines' idempotency checks key on;
- ``abort`` removes stray tmp shards, so a failed job leaves no
  half-visible output: readers treat manifest-less directories as
  absent, the same contract as the parquet zones.

This is the same write-new-then-publish pattern the CDC sink and
``compact_table`` use, expressed through the DataSource protocol —
and the template for sinks whose target genuinely isn't a file system
(HTTP ingest endpoints, message queues): shard upload in ``write``,
atomic publish in ``commit``.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


@dataclass
class ShardCommit(WriterCommitMessage):
    tmp_name: str
    final_name: str
    n_rows: int


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError("jsonl_manifest sink requires option path")
        self.path = options["path"]
        # Job-unique tag, minted ONCE on the driver (the writer
        # instance is pickled to every task, so speculative duplicate
        # attempts share it): shard names embed it, which lets commit
        # janitor THIS job's orphans without touching a concurrent
        # job's in-flight tmp shards on the same path (r13 review).
        self.job_tag = uuid.uuid4().hex[:8]

    def write(self, rows: Iterator[Row]) -> ShardCommit:
        os.makedirs(self.path, exist_ok=True)
        shard = uuid.uuid4().hex[:16]
        tmp = f"part-{self.job_tag}-{shard}.jsonl.tmp"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return ShardCommit(
            tmp_name=tmp,
            final_name=f"part-{self.job_tag}-{shard}.jsonl",
            n_rows=n,
        )

    def commit(self, messages: list[ShardCommit]) -> None:
        shards = []
        for m in messages:
            os.rename(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, m.final_name),
            )
            shards.append({"file": m.final_name, "n_rows": m.n_rows})
        # Janitor stray tmp shards: a speculative duplicate attempt
        # whose commit message lost the race leaves an orphan
        # part-<job_tag>-*.jsonl.tmp. It is unreachable (readers go
        # through the manifest) but costs disk; commit runs exactly
        # once with the full winner set, so any tmp shard bearing THIS
        # job's tag that isn't a winner is dead. Scoping by tag keeps
        # a concurrent job's in-flight tmp shards on the same path
        # untouched (last manifest wins, as before).
        committed = {m.tmp_name for m in messages}
        mine = f"part-{self.job_tag}-"
        for name in os.listdir(self.path):
            if (
                name.startswith(mine)
                and name.endswith(".jsonl.tmp")
                and name not in committed
            ):
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    # best-effort sweep (ADVICE r13): the winner shards
                    # are already renamed into place, so a failed unlink
                    # (permissions, sticky dir, non-POSIX open handle)
                    # must not abort the commit after publication — it
                    # would leave published-looking shards with no
                    # manifest. A leaked tmp shard costs disk only;
                    # readers go through the manifest.
                    pass
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(
                {"shards": shards, "total_rows": sum(s["n_rows"] for s in shards)},
                f,
            )
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages: list[ShardCommit]) -> None:
        # Failed tasks contribute None to messages (DataSourceWriter
        # contract: "If a write task fails, the commit message will be
        # None") — and abort only runs when at least one task failed,
        # so a None is ALWAYS present. Skipping it is what lets the
        # successful tasks' tmp shards actually get cleaned up; crashing
        # here would both leak them and shadow the real task error.
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlManifestWriter:
        if overwrite:
            # publish-by-manifest means overwrite = replace the manifest;
            # stale shards are unreachable (readers go through it)
            pass
        return JsonlManifestWriter(self.options)
