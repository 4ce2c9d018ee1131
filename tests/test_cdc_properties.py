"""Property tests: apply_cdc against a sequential Python fold over
random change logs (hypothesis), and batch-split associativity on the
same logs."""

import hypothesis.strategies as st
from hypothesis import given, settings

from adi_226_datawarehouse_project_spark.operators.cdc import apply_cdc

KEYS = list(range(6))

change = st.tuples(
    st.sampled_from(KEYS),                      # id
    st.sampled_from(["a", "b", "c", None]),     # payload
    st.sampled_from(["I", "U", "D"]),           # op
)


def _ref_fold(base, log):
    """Latest-wins by (seq, D>U>I): fold sorted by the window's order."""
    prec = {"D": 2, "U": 1, "I": 0}
    winner = {}
    for seq, (k, v, op) in enumerate(log):
        # unique seqs here, so precedence never fires; keep it anyway
        if k not in winner or (seq, prec[op]) > winner[k][0]:
            winner[k] = ((seq, prec[op]), v, op)
    state = dict(base)
    for k, (_, v, op) in winner.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    return state


@settings(max_examples=15, deadline=None)
@given(
    base=st.dictionaries(st.sampled_from(KEYS), st.sampled_from(["x", "y"]), max_size=6),
    log=st.lists(change, min_size=0, max_size=12),
    split=st.integers(min_value=0, max_value=12),
)
def test_apply_cdc_matches_python_fold(spark, base, log, split):
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [], "id INT, v STRING"
    )
    rows = [(k, v, i, op) for i, (k, v, op) in enumerate(log)]
    log_df = spark.createDataFrame(rows or [], "id INT, v STRING, seq INT, op STRING")
    got = {
        r["id"]: r["v"] for r in apply_cdc(base_df, log_df, ["id"], "seq").collect()
    }
    assert got == _ref_fold(base, log)

    # associativity: applying [0:split] then [split:] == all at once
    split = min(split, len(rows))
    df1 = spark.createDataFrame(rows[:split] or [], "id INT, v STRING, seq INT, op STRING")
    df2 = spark.createDataFrame(rows[split:] or [], "id INT, v STRING, seq INT, op STRING")
    two_step = apply_cdc(apply_cdc(base_df, df1, ["id"], "seq"), df2, ["id"], "seq")
    got2 = {r["id"]: r["v"] for r in two_step.collect()}
    assert got2 == got
