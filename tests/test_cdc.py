"""CDC apply: latest-wins fold of an I/U/D change log — idempotent,
associative over batches, delete-aware, out-of-order safe, loud on
unknown ops."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.cdc import apply_cdc, latest_changes


@pytest.fixture()
def snapshot(spark):
    return spark.createDataFrame(
        [
            Row(id=1, name="alice", balance=100),
            Row(id=2, name="bob", balance=200),
            Row(id=3, name="carol", balance=300),
        ]
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id INT, name STRING, balance INT, seq INT, op STRING"
    )


def _state(df):
    return sorted((r["id"], r["name"], r["balance"]) for r in df.collect())


def test_insert_update_delete_latest_wins(spark, snapshot):
    log = _changes(
        spark,
        [
            (2, "bob", 250, 10, "U"),       # update bob
            (2, "bob", 275, 12, "U"),       # later update wins
            (3, None, None, 11, "D"),       # delete carol
            (4, "dave", 50, 13, "I"),       # insert dave
            (4, "dave", 75, 9, "U"),        # STALE (lower seq) — ignored
        ],
    )
    got = _state(apply_cdc(snapshot, log, ["id"], "seq"))
    assert got == [(1, "alice", 100), (2, "bob", 275), (4, "dave", 50)]


def test_apply_is_idempotent_and_associative(spark, snapshot):
    b1 = _changes(spark, [(2, "bob", 250, 10, "U"), (4, "dave", 50, 11, "I")])
    b2 = _changes(spark, [(2, "bob", 275, 12, "U"), (1, None, None, 13, "D")])
    once = apply_cdc(snapshot, b1, ["id"], "seq")
    twice = apply_cdc(once, b1, ["id"], "seq")
    assert _state(once) == _state(twice)
    sequential = apply_cdc(once, b2, ["id"], "seq")
    combined = apply_cdc(snapshot, b1.unionByName(b2), ["id"], "seq")
    assert _state(sequential) == _state(combined)


def test_out_of_order_within_batch_and_partitioning(spark, snapshot):
    rows = [
        (5, "eve", 1, 3, "I"),
        (5, "eve", 3, 5, "U"),
        (5, "eve", 2, 4, "U"),
    ]
    import random

    shuffled = list(rows)
    random.Random(7).shuffle(shuffled)
    log = _changes(spark, shuffled).repartition(5)
    got = _state(apply_cdc(snapshot, log, ["id"], "seq"))
    assert (5, "eve", 3) in got


def test_delete_beats_update_on_seq_tie(spark, snapshot):
    log = _changes(spark, [(2, "bob", 999, 10, "U"), (2, None, None, 10, "D")])
    got = _state(apply_cdc(snapshot, log, ["id"], "seq"))
    assert [i for (i, _, _) in got] == [1, 3]


def test_unknown_op_raises_missing_columns_raise(spark, snapshot):
    log = _changes(spark, [(2, "bob", 1, 10, "X")])
    with pytest.raises(Exception, match="unknown op"):
        apply_cdc(snapshot, log, ["id"], "seq").collect()
    with pytest.raises(ValueError, match="missing base columns"):
        apply_cdc(snapshot, log.drop("balance"), ["id"], "seq")


def test_latest_changes_no_global_window(spark):
    log = _changes(spark, [(i, "x", i, i, "U") for i in range(20)])
    plan = (
        latest_changes(log, ["id"], "seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the window is partitioned by the key — never a single partition
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert line.count("], [") >= 2, f"global window: {line}"


def test_apply_cdc_defends_against_stale_batch_when_base_keeps_seq(spark):
    """A base snapshot that RETAINS seq_col must defend itself: a late
    batch carrying an older seq for a key loses to what is already
    folded (the streaming sink's layout). Without the defense the
    stale row overwrote newer data and 'two batches == their union'
    broke for interleaved seqs."""
    from adi_226_datawarehouse_project_spark.operators.cdc import apply_cdc

    base = spark.createDataFrame(
        [(1, "v2", 2)], "k INT, v STRING, seq INT"
    )
    late = spark.createDataFrame(
        [(1, 1, "U", "v1")], "k INT, seq INT, op STRING, v STRING"
    )
    out = apply_cdc(base, late, ["k"], "seq").collect()
    assert len(out) == 1 and out[0]["v"] == "v2" and out[0]["seq"] == 2
    # and a genuinely NEWER change still wins
    newer = spark.createDataFrame(
        [(1, 3, "U", "v3")], "k INT, seq INT, op STRING, v STRING"
    )
    out2 = apply_cdc(base, newer, ["k"], "seq").collect()
    assert len(out2) == 1 and out2[0]["v"] == "v3"


def test_latest_changes_tiebreak_is_total(spark):
    """Equal (seq, op) with DIFFERENT payloads used to pick a winner by
    shuffle arrival order; the full-row hash tie-break makes the window
    order total, so reversing the input order cannot flip the winner."""
    from adi_226_datawarehouse_project_spark.operators.cdc import latest_changes

    rows = [(1, 5, "U", "p1"), (1, 5, "U", "p2")]
    a = latest_changes(
        spark.createDataFrame(rows, "k INT, seq INT, op STRING, v STRING"),
        ["k"], "seq",
    ).collect()
    b = latest_changes(
        spark.createDataFrame(rows[::-1], "k INT, seq INT, op STRING, v STRING"),
        ["k"], "seq",
    ).collect()
    assert len(a) == len(b) == 1
    assert a[0]["v"] == b[0]["v"]


def test_map_payload_columns_fold_without_legacy_conf(spark):
    """xxhash64 rejects MapType (SPARK hash expressions); the tie-break
    must skip unhashable columns so change feeds with a map payload —
    which folded fine before the tie-break existed — keep working."""
    base = spark.createDataFrame(
        [(1, {"a": 1}, 1)], "k INT, attrs MAP<STRING,INT>, seq INT"
    )
    changes = spark.createDataFrame(
        [(1, {"a": 2}, 5, "U"), (2, {"b": 3}, 6, "I")],
        "k INT, attrs MAP<STRING,INT>, seq INT, op STRING",
    )
    out = apply_cdc(base, changes, ["k"], "seq")
    got = {r["k"]: dict(r["attrs"]) for r in out.collect()}
    assert got == {1: {"a": 2}, 2: {"b": 3}}
    # the order STAYS total on the hashable prefix: distinct hashable
    # payloads with equal (seq, op) still fold order-independently
    rows = [(1, {"x": 0}, 5, "U", "p1"), (1, {"x": 0}, 5, "U", "p2")]
    schema = "k INT, m MAP<STRING,INT>, seq INT, op STRING, v STRING"
    a = latest_changes(spark.createDataFrame(rows, schema), ["k"], "seq").collect()
    b = latest_changes(
        spark.createDataFrame(rows[::-1], schema), ["k"], "seq"
    ).collect()
    assert len(a) == len(b) == 1 and a[0]["v"] == b[0]["v"]


def test_hashable_type_predicate():
    """Maps are unhashable at ANY nesting depth; everything else stays
    eligible for the tie-break hash."""
    from pyspark.sql import types as T

    from adi_226_datawarehouse_project_spark.operators.cdc import _hashable

    m = T.MapType(T.StringType(), T.IntegerType())
    assert not _hashable(m)
    assert not _hashable(T.ArrayType(m))
    assert not _hashable(T.StructType([T.StructField("m", m)]))
    assert _hashable(T.ArrayType(T.StringType()))
    assert _hashable(T.StructType([T.StructField("x", T.DoubleType())]))
