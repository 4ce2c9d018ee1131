"""Property tests: asof_join against a pure-Python backward-inclusive
reference over random keyed event sets (hypothesis) — duplicate right
timestamps (tie broken by the last right_value_col, here the unique
rid), left rows with no prior right row, keys present on only one
side, and empty sides."""

from __future__ import annotations

import datetime as dt

import hypothesis.strategies as st
from hypothesis import given, settings

from adi_226_datawarehouse_project_spark.operators.asof import asof_join

KEYS = ["a", "b", "c"]
event = st.tuples(st.sampled_from(KEYS), st.integers(min_value=0, max_value=30))


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _ref(left: list[tuple[str, int]], right: list[tuple[str, int]]):
    """lid -> rid of the latest right row with same key and ts <= left
    ts; ties at the same ts break to the LARGEST rid (the operator's
    documented tie rule: last right_value_col, unique id passed last)."""
    out = {}
    for lid, (lk, lt) in enumerate(left):
        best = None
        for rid, (rk, rt) in enumerate(right):
            if rk == lk and rt <= lt and (best is None or (rt, rid) > best):
                best = (rt, rid)
        out[lid] = None if best is None else best[1]
    return out


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(event, min_size=0, max_size=20),
    right=st.lists(event, min_size=0, max_size=20),
)
def test_asof_matches_python_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t) in enumerate(left)] or [],
        "lid INT, k STRING, ts TIMESTAMP",
    )
    rdf = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t) in enumerate(right)] or [],
        "rid INT, k STRING, ts TIMESTAMP",
    )
    got_rows = asof_join(
        ldf, rdf, by=["k"], ts="ts", right_value_cols=["rid"]
    ).collect()
    got = {r["lid"]: r["asof_rid"] for r in got_rows}
    assert got == _ref(left, right)
    # exactly one output row per left row, and matched rows carry the
    # matched right timestamp
    assert len(got_rows) == len(left)
    for r in got_rows:
        if r["asof_rid"] is not None:
            assert r["asof_ts"] == _ts(right[r["asof_rid"]][1])
        else:
            assert r["asof_ts"] is None
