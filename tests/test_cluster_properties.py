"""Property tests: star-contraction connected components vs a Python
union-find over random graphs (hypothesis) — random edge sets cover
shapes the hand-picked cases in test_dedup.py can't enumerate
(multi-component mixes, dense cores with pendant chains, duplicate and
self edges)."""

import hypothesis.strategies as st
from hypothesis import given, settings

from adi_226_datawarehouse_project_spark.operators.dedup import near_dup_clusters

N_NODES = 24

edge = st.tuples(
    st.integers(min_value=0, max_value=N_NODES - 1),
    st.integers(min_value=0, max_value=N_NODES - 1),
)


def _uf(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


@settings(max_examples=12, deadline=None)
@given(edges=st.lists(edge, min_size=0, max_size=40))
def test_contraction_matches_union_find_on_random_graphs(spark, edges):
    node_ids = list(range(N_NODES))
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id bigint")
    if edges:
        pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    else:
        pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(nodes, "doc_id", pairs).collect()
    }
    assert got == _uf(node_ids, edges)
