"""Custom JSONL manifest sink: values roundtrip, per-shard manifest
counts match, _SUCCESS appears only on commit, and a mid-write task
failure leaves no committed output (abort semantics)."""

import json
import os
import shutil

import pytest
from conftest import SF_SMALL
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.sources.jsonl_sink import (
    JsonlManifestDataSource,
)

BASE = "/tmp/spark_graft_io/test_jsonl_sink"


def test_commit_publishes_shards_manifest_and_success(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    spark.dataSource.register(JsonlManifestDataSource)
    nation = load_table(spark, SF_SMALL, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.repartition(3).write.mode("overwrite").format("jsonl_manifest").option(
        "path", f"{BASE}/out"
    ).save()

    assert os.path.exists(f"{BASE}/out/_SUCCESS")
    with open(f"{BASE}/out/_MANIFEST.json") as f:
        man = json.load(f)
    assert man["total_rows"] == nation.count()
    assert len(man["shards"]) == 3
    # no tmp residue; every listed shard exists with its exact rows
    files = os.listdir(f"{BASE}/out")
    assert not any(fn.endswith(".tmp") for fn in files)
    got = []
    for s in man["shards"]:
        with open(f"{BASE}/out/{s['file']}") as f:
            lines = [json.loads(line) for line in f]
        assert len(lines) == s["n_rows"]
        got += lines
    want = sorted(
        (r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in nation.collect()
    )
    assert sorted((g["n_nationkey"], g["n_name"], g["n_regionkey"]) for g in got) == want


def test_task_failure_aborts_without_publishing(spark):
    shutil.rmtree(f"{BASE}/fail", ignore_errors=True)
    spark.dataSource.register(JsonlManifestDataSource)
    poisoned = (
        load_table(spark, SF_SMALL, "nation")
        .select("n_nationkey")
        .withColumn(
            "boom",
            F.when(
                F.col("n_nationkey") == 7,
                F.raise_error(F.lit("injected write failure")).cast("string"),
            ).otherwise(F.lit("ok")),
        )
    )
    with pytest.raises(Exception, match="injected write failure"):
        poisoned.repartition(3).write.mode("overwrite").format("jsonl_manifest").option(
            "path", f"{BASE}/fail"
        ).save()
    # nothing published: no manifest, no _SUCCESS, no visible shards
    files = os.listdir(f"{BASE}/fail") if os.path.isdir(f"{BASE}/fail") else []
    assert "_MANIFEST.json" not in files and "_SUCCESS" not in files
    assert not any(f.endswith(".jsonl") for f in files)


def test_abort_tolerates_none_messages_and_cleans_tmp_shards(tmp_path):
    """DataSourceWriter contract: a FAILED task contributes None to the
    abort messages — and abort only runs when at least one task failed,
    so a None is always present. The old loop crashed on it
    (AttributeError on None.tmp_name), leaking every successful task's
    tmp shard and shadowing the real error; abort must skip Nones and
    still remove the committed tasks' tmp files."""
    from adi_226_datawarehouse_project_spark.sources.jsonl_sink import (
        JsonlManifestWriter,
        ShardCommit,
    )

    w = JsonlManifestWriter({"path": str(tmp_path)})
    (tmp_path / "part-aa.jsonl.tmp").write_text("{}\n")
    (tmp_path / "part-bb.jsonl.tmp").write_text("{}\n")
    w.abort(
        [
            ShardCommit(tmp_name="part-aa.jsonl.tmp", final_name="part-aa.jsonl", n_rows=1),
            None,  # the failed task
            ShardCommit(tmp_name="part-bb.jsonl.tmp", final_name="part-bb.jsonl", n_rows=1),
        ]
    )
    left = [p.name for p in tmp_path.iterdir()]
    assert left == [], left


def test_commit_janitors_orphan_speculative_tmp_shards(tmp_path):
    """A speculative duplicate attempt whose commit message lost the
    race leaves an orphan part-*.jsonl.tmp (unreachable via the
    manifest, but disk residue). commit runs exactly once with the full
    winner set, so it must sweep any remaining *.jsonl.tmp that is not
    a winner — and must not touch the published shards (r12 nit)."""
    from adi_226_datawarehouse_project_spark.sources.jsonl_sink import (
        JsonlManifestWriter,
        ShardCommit,
    )

    w = JsonlManifestWriter({"path": str(tmp_path)})
    tag = w.job_tag
    (tmp_path / f"part-{tag}-winner.jsonl.tmp").write_text('{"a": 1}\n')
    # the speculative loser's shard: same job tag, different task uuid,
    # no commit message
    (tmp_path / f"part-{tag}-loser.jsonl.tmp").write_text('{"a": 1}\n')
    # a CONCURRENT job's in-flight shard (different tag): must survive
    (tmp_path / "part-deadbeef-other.jsonl.tmp").write_text('{"b": 2}\n')
    w.commit(
        [
            ShardCommit(
                tmp_name=f"part-{tag}-winner.jsonl.tmp",
                final_name=f"part-{tag}-winner.jsonl",
                n_rows=1,
            )
        ]
    )
    names = {p.name for p in tmp_path.iterdir()}
    assert names == {
        "_MANIFEST.json",
        "_SUCCESS",
        "part-deadbeef-other.jsonl.tmp",
        f"part-{tag}-winner.jsonl",
    }, names
