"""Property test: the built-in ``session_window`` aggregation against a
pure-Python gap-sessionization reference over random event sets
(hypothesis) — the boundary semantics the `stream_session_window`
driver gate's DuckDB oracle encodes (merge while ``diff <= gap``,
split at ``diff > gap``, window end = last event + gap) must hold for
ADVERSARIAL timestamp layouts: exact-gap differences, duplicate
timestamps within a user, singleton sessions, and users with
interleaved event times.

This suite's FIRST run (r13) falsified the repo's previous documented
claim that session_window splits at ``diff >= gap``: two events at 0s
and 60s with a 60s gap form ONE session [0, 120) — the exact-gap case
MERGES, the same boundary as the SQL lag form. The driver gate's
oracle was corrected to ``> gap`` on the back of this test; a Spark
upgrade that moved the boundary or the end padding fails here before
it fails in the driver's CORRECTNESS run."""

from __future__ import annotations

import datetime as dt

import hypothesis.strategies as st
from hypothesis import given, settings
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.streaming.events_stream import (
    session_window_counts,
)

GAP_S = 60
BASE = dt.datetime(2024, 1, 1)

# offsets on a 30s grid up to 300s: consecutive-event diffs hit 0
# (duplicate ts), 30 (merge), 60 (EXACT gap — the boundary), 90+
# (split) with high probability in 20-event lists
event = st.tuples(
    st.sampled_from([1, 2, 3]),
    st.integers(min_value=0, max_value=10).map(lambda k: k * 30),
)


def _ref_sessions(events: list[tuple[int, int]]):
    """(user, start_offset, end_offset, n_events) with session_window
    semantics as EMPIRICALLY pinned: merge while diff <= gap, split at
    diff > gap, end = last event + gap."""
    out = set()
    by_user: dict[int, list[int]] = {}
    for u, s in events:
        by_user.setdefault(u, []).append(s)
    for u, offs in by_user.items():
        offs.sort()
        start = prev = offs[0]
        n = 0
        for t in offs:
            if t - prev > GAP_S:
                out.add((u, start, prev + GAP_S, n))
                start, n = t, 0
            n += 1
            prev = t
        out.add((u, start, prev + GAP_S, n))
    return out


@settings(max_examples=12, deadline=None)
@given(events=st.lists(event, min_size=1, max_size=20))
def test_session_window_matches_reference(spark, events):
    df = spark.createDataFrame(
        [
            (u, BASE + dt.timedelta(seconds=s))
            for u, s in events
        ],
        "user_id bigint, event_time timestamp",
    )
    got = {
        (
            r["user_id"],
            int((r["session_start"] - BASE).total_seconds()),
            int((r["session_end"] - BASE).total_seconds()),
            r["n_events"],
        )
        for r in session_window_counts(df, f"{GAP_S} seconds").collect()
    }
    assert got == _ref_sessions(events)
