"""Similarity-search operators: exact cosine vs numpy, LSH recall vs
the exact baseline (correctness authority for rows-only sim_lsh_topk)."""

import numpy as np
import pytest
from conftest import SF_SMALL

from adi_226_datawarehouse_project_spark.operators.similarity import (
    cosine,
    cosine_self_topk,
    embedding_near_dup_pairs,
    lsh_bucket_topk,
)
from adi_226_datawarehouse_project_spark.sources.catalog import load_table

from pyspark.sql import functions as F


def test_cosine_matches_numpy(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 2, [0.0, 1.0, 0.0]),
        (3, [1.0, 1.0, 0.0], 4, [1.0, 0.0, 0.0]),
        (5, [2.0, 2.0, 2.0], 6, [1.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["ia", "va", "ib", "vb"])
    got = [r["c"] for r in df.select(cosine(F.col("va"), F.col("vb")).alias("c")).collect()]
    for (ia, va, ib, vb), g in zip(rows, got):
        a, b = np.array(va), np.array(vb)
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(g - want) < 1e-12


def test_topk_matches_numpy_bruteforce(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    probes = [0, 1, 2]
    got = cosine_self_topk(emb, "vec_id", "embedding", k=3, probe_ids=probes).collect()
    pdf = emb.toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    for q in probes:
        qv = vecs[q]
        scores = {
            n: float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for n, v in vecs.items()
            if n != q
        }
        want = sorted(scores, key=lambda n: (-scores[n], n))[:3]
        mine = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == q]
        assert mine == want


def _recall(exact, approx):
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    return hits / sum(len(s) for s in exact_sets.values())


def test_lsh_recall_vs_exact(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    probes = list(range(20))
    exact = cosine_self_topk(emb, "vec_id", "embedding", k=5, probe_ids=probes).collect()
    # default tuning (16 planes / 4 bands): cheap candidates, modest recall
    fast = lsh_bucket_topk(emb, "vec_id", "embedding", k=5, probe_ids=probes).collect()
    assert _recall(exact, fast) >= 0.3
    # recall tuning (8 bands of 2 bits): wide candidate net, high recall
    wide = lsh_bucket_topk(
        emb, "vec_id", "embedding", k=5, bands=8, probe_ids=probes
    ).collect()
    assert _recall(exact, wide) >= 0.9


def test_embedding_near_dup_self_consistent(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").limit(200)
    doubled = emb.union(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    pairs = embedding_near_dup_pairs(doubled, "vec_id", "embedding", min_cosine=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # every planted duplicate (v, v+100000) must be found: identical
    # vectors share all SRP buckets (every band agrees) and have
    # cosine exactly 1, so banding never loses them.
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    for v in ids:
        assert (v, v + 100000) in got


def test_embedding_near_dup_banded_recall_on_perturbed(spark):
    """The round-3 verdict's recall cliff, pinned: perturbed (NOT
    identical) near-dups at cosine ≈0.93-0.99 must be recovered. A
    single 16-plane bucket join has per-pair recall (1-θ/π)^16 ≈
    0.13-0.52 here; the 4×4-bit banded join is ≈0.97-0.9995 — the 0.85
    floor separates the two designs decisively over 100 planted pairs."""
    import numpy as np

    rng = np.random.default_rng(11)
    n, dim = 100, 64
    rows = []
    for i in range(n):
        v = rng.standard_normal(dim)
        # relative noise, amplitude stepped over ~0.2-0.55 → cosine
        # spread ≈0.93-0.99 (verified by the exact check below)
        noise = v * rng.standard_normal(dim) * (0.2 + 0.35 * (i % 4) / 3.0)
        rows.append((i, v.tolist()))
        rows.append((i + 100000, (v + noise).tolist()))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    vecs = dict(rows)
    planted = []
    for i in range(n):
        a, b = np.array(vecs[i]), np.array(vecs[i + 100000])
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        if c >= 0.9:
            planted.append((i, i + 100000))
    assert len(planted) >= 50, "fixture must plant a real truth set"
    pairs = embedding_near_dup_pairs(emb, "vec_id", "embedding", min_cosine=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    hit = sum(1 for p in planted if p in got)
    assert hit / len(planted) >= 0.85, f"banded recall {hit}/{len(planted)}"
    # precision is exact by re-score: no reported pair below threshold
    for r in pairs.collect():
        a = np.array(vecs[r["id_a"]])
        b = np.array(vecs[r["id_b"]])
        assert a @ b / (np.linalg.norm(a) * np.linalg.norm(b)) >= 0.9 - 1e-9


def test_ivf_recall_vs_exact(spark):
    from adi_226_datawarehouse_project_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    probes = list(range(20))
    exact = cosine_self_topk(emb, "vec_id", "embedding", k=10, probe_ids=probes).collect()
    # default cells/probes (measured ~0.83 at sf0.001)
    got = ivf_topk(emb, "vec_id", "embedding", k=10, probe_ids=probes).collect()
    assert _recall(exact, got) >= 0.7
    # probing more cells must not lower recall
    wide = ivf_topk(
        emb, "vec_id", "embedding", k=10, n_probe=8, probe_ids=probes
    ).collect()
    assert _recall(exact, wide) >= _recall(exact, got)


def test_ivf_kmeans_centroids_recall(spark):
    """k-means cells must not degrade recall vs the deterministic
    sample at identical (n_clusters, n_probe); trainer output is
    unit-norm with exactly n_clusters rows."""
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = train_ivf_centroids(emb, "vec_id", "embedding", n_clusters=16, n_iter=4)
    rows = cents.collect()
    assert len(rows) == 16
    assert sorted(r["centroid_id"] for r in rows) == list(range(16))
    for r in rows:
        assert abs(sum(x * x for x in r["centroid"]) - 1.0) < 1e-9

    probes = list(range(20))
    exact = cosine_self_topk(emb, "vec_id", "embedding", k=10, probe_ids=probes).collect()
    sampled = ivf_topk(emb, "vec_id", "embedding", k=10, probe_ids=probes).collect()
    trained = ivf_topk(
        emb, "vec_id", "embedding", k=10, probe_ids=probes, centroids=cents
    ).collect()
    assert _recall(exact, trained) >= _recall(exact, sampled) - 0.05
    assert _recall(exact, trained) >= 0.7


def test_train_ivf_caches_projection_across_iterations(spark, monkeypatch):
    """Lloyd iterations must scan the cached (id, vec) projection, not
    re-scan the source each pass: train_ivf_centroids persists the
    projection exactly once before the loop and unpersists it after —
    at 100 TB that's one table scan instead of n_iter."""
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        train_ivf_centroids,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    # patch the CONCRETE class (pyspark 4 routes the public
    # pyspark.sql.DataFrame through a classic/connect subclass whose
    # overrides would bypass a base-class patch)
    cls = type(emb)
    persisted: list[list[str]] = []
    unpersisted: list[list[str]] = []
    orig_p, orig_u = cls.persist, cls.unpersist

    def rec_persist(self, *a, **k):
        persisted.append(self.columns)
        return orig_p(self, *a, **k)

    def rec_unpersist(self, *a, **k):
        unpersisted.append(self.columns)
        return orig_u(self, *a, **k)

    monkeypatch.setattr(cls, "persist", rec_persist)
    monkeypatch.setattr(cls, "unpersist", rec_unpersist)
    cents = train_ivf_centroids(emb, "vec_id", "embedding", n_clusters=4, n_iter=3)
    assert cents.count() == 4
    assert ["__id", "__v"] in persisted, "the (id, vec) projection must be persisted"
    assert ["__id", "__v"] in unpersisted, "and unpersisted after the loop"
    # cached once, not once per iteration
    assert persisted.count(["__id", "__v"]) == 1


def test_kmeans_assignment_plan_is_shuffle_free(spark):
    """The assignment pass inlines centroids as literals — the plan
    must contain no Exchange (no join, no window)."""
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        _nearest_centroid_lit,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = [[1.0 if i == j else 0.0 for i in range(dim)] for j in range(4)]
    assign = emb.select(_nearest_centroid_lit("embedding", cents, dim).alias("c"))
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert assign.count() == emb.count()


def test_kmeans_assignment_thresholds_to_broadcast_join(spark):
    """Past _INLINE_MAX_TERMS (k×dim), literal inlining would blow
    codegen — assignment must switch to the broadcast-join argmax and
    produce IDENTICAL centroids to the literal path at any width."""
    import numpy as np

    from adi_226_datawarehouse_project_spark.operators.similarity import (
        _assign_join,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(7)

    # Path equivalence at a width where the literal path is feasible:
    # dim=64 k=32 (2048 terms -> literal by default; force join with
    # inline_max_terms=0) must yield bit-compatible centroids.
    dim, n, k = 64, 300, 32
    rows = [(i, rng.standard_normal(dim).tolist()) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    lits = train_ivf_centroids(emb, "vec_id", "embedding", n_clusters=k, n_iter=2)
    joined = train_ivf_centroids(
        emb, "vec_id", "embedding", n_clusters=k, n_iter=2, inline_max_terms=0
    )
    got = {r["centroid_id"]: r["centroid"] for r in joined.collect()}
    want = {r["centroid_id"]: r["centroid"] for r in lits.collect()}
    assert got.keys() == want.keys()
    for cid in want:
        assert np.allclose(got[cid], want[cid], atol=1e-12), f"centroid {cid} differs"

    # Production width (dim=256, k*dim=12288 > _INLINE_MAX_TERMS): the
    # auto path must train without a literal blowup (the forced-literal
    # form OOMs codegen here) and the assignment plan must be a
    # broadcast join, never a sort-merge join of the corpus.
    dim_w, k_w = 256, 48
    wide_rows = [(i, rng.standard_normal(dim_w).tolist()) for i in range(150)]
    wide = spark.createDataFrame(wide_rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    cents_wide = train_ivf_centroids(wide, "vec_id", "embedding", n_clusters=k_w, n_iter=1)
    assert cents_wide.count() == k_w
    vecs = wide.select(F.col("vec_id").alias("__id"), F.col("embedding").alias("__v"))
    cents = [r["centroid"] for r in cents_wide.collect()]
    plan = _assign_join(vecs, cents)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cosine_self_topk_guards_full_scan(spark):
    """probe_ids=None is an O(n²) all-pairs scan — must be an explicit
    opt-in, not a silent default."""
    import pytest

    emb = load_table(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="allow_full_scan"):
        cosine_self_topk(emb, "vec_id", "embedding", k=3)
    # explicit opt-in still works
    out = cosine_self_topk(emb, "vec_id", "embedding", k=1, allow_full_scan=True)
    assert out.limit(1).count() == 1


def test_semantic_dedup_within_cell_collapse(spark):
    from adi_226_datawarehouse_project_spark.operators.similarity import semantic_dedup

    # sample_centroids takes the 3 SMALLEST ids as cells, so ids 0-2
    # are three well-separated axis vectors; the near-dup chain
    # 100~101~102 all land in the +x cell (with its centroid, which is
    # itself within 0.99 cosine → joins the component, rep = 0), the
    # pair 110~111 lands in +y (rep = 1), and 120 is equidistant from
    # every centroid but near none, so it survives alone.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (100, [0.9999, 0.01, 0.0]),
        (101, [0.9998, 0.02, 0.0]),
        (102, [0.9997, 0.03, 0.0]),
        (110, [0.01, 0.9999, 0.0]),
        (111, [0.02, 0.9998, 0.0]),
        (120, [0.577, 0.577, 0.577]),
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    cl = semantic_dedup(df, "vec_id", "embedding", min_cosine=0.99, n_clusters=3)
    got = {r["vec_id"]: r["cluster_id"] for r in cl.collect()}
    assert got[100] == got[101] == got[102] == got[0] == 0
    assert got[110] == got[111] == got[1] == 1
    assert got[2] == 2 and got[120] == 120
    survivors = sorted(i for i, c in got.items() if i == c)
    assert survivors == [0, 1, 2, 120]


def test_semantic_dedup_misses_cross_cell_pairs_by_design(spark):
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        sample_centroids,
        semantic_dedup,
    )

    # Centroids are the two smallest ids = the dup pair itself, so each
    # member is its own cell's centroid and the pair straddles cells:
    # SemDeDup must NOT examine it (the documented approximation).
    rows = [(0, [1.0, 0.0]), (1, [0.9999, 0.0141]), (5, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    cents = sample_centroids(df, "vec_id", "embedding", 2)
    cl = semantic_dedup(
        df, "vec_id", "embedding", min_cosine=0.99, n_clusters=2, centroids=cents
    )
    got = {r["vec_id"]: r["cluster_id"] for r in cl.collect()}
    assert got == {0: 0, 1: 1, 5: 5}
    # multi-probe is the recall lever for exactly this case: with
    # n_probe=2 each member also probes its second-nearest cell, the
    # probe sets intersect, the pair is re-scored and collapses.
    cl2 = semantic_dedup(
        df, "vec_id", "embedding", min_cosine=0.99, n_clusters=2,
        centroids=cents, n_probe=2,
    )
    got2 = {r["vec_id"]: r["cluster_id"] for r in cl2.collect()}
    assert got2 == {0: 0, 1: 0, 5: 5}


def test_semantic_dedup_multi_probe_preserves_single_probe_results(spark):
    """n_probe=1 must stay bit-identical to the oracle-pinned path,
    and raising n_probe may only ADD pairs (superset clusters) — here
    the fully-within-cell corpus collapses identically at 1, 2, 4."""
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        assign_cells,
        assign_cells_multi,
        sample_centroids,
        semantic_dedup,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (100, [0.9999, 0.01, 0.0]),
        (101, [0.9998, 0.02, 0.0]),
        (110, [0.01, 0.9999, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    cents = sample_centroids(df, "vec_id", "embedding", 2)
    single = assign_cells(df, "vec_id", "embedding", cents)
    multi1 = assign_cells_multi(df, "vec_id", "embedding", cents, n_probe=1)
    key = lambda d: sorted(  # noqa: E731
        (r["vec_id"], r["centroid_id"]) for r in d.collect()
    )
    assert key(single) == key(multi1)
    # n_probe=2 over 2 cells: every vector probes both cells
    multi2 = assign_cells_multi(df, "vec_id", "embedding", cents, n_probe=2)
    assert len(key(multi2)) == 2 * len(rows)
    want = {0: 0, 1: 1, 100: 0, 101: 0, 110: 1}
    for npb in (1, 2, 4):
        cl = semantic_dedup(
            df, "vec_id", "embedding", min_cosine=0.99, n_clusters=2,
            centroids=cents, n_probe=npb,
        )
        assert {r["vec_id"]: r["cluster_id"] for r in cl.collect()} == want


def test_srp_band_buckets_match_signature_shift_mask(spark):
    """The per-band pack must equal shift/mask over the packed
    signature at every operating point both support — this is what
    keeps the oracle-pinned 16/4 values identical post-refactor."""
    from pyspark.sql import functions as F

    from adi_226_datawarehouse_project_spark.operators.similarity import (
        srp_band_buckets,
        srp_signature,
    )

    df = spark.range(20).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 15), i -> CAST(xxhash64(id, i) % 97 AS DOUBLE) / 97.0 - 0.5)"
        " AS embedding",
    )
    for planes, bands in [(16, 4), (16, 2), (48, 4)]:
        bits = planes // bands
        mask = (1 << bits) - 1
        via_sig = df.select(
            "vec_id",
            F.array(
                *[
                    F.shiftrightunsigned(
                        srp_signature("embedding", planes), b * bits
                    ).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            ).alias("b"),
        ).collect()
        via_bands = df.select(
            "vec_id", srp_band_buckets("embedding", planes, bands).alias("b")
        ).collect()
        assert {r["vec_id"]: r["b"] for r in via_sig} == {
            r["vec_id"]: r["b"] for r in via_bands
        }


def test_srp_wide_planes_supported_and_signature_guarded(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from adi_226_datawarehouse_project_spark.operators.similarity import (
        srp_band_buckets,
        srp_signature,
    )

    df = spark.range(4).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 7), i -> CAST(xxhash64(id, i) % 11 AS DOUBLE) - 5.0)"
        " AS embedding",
    )
    # 64 planes work through band buckets (8x8 bits)...
    rows = df.select(srp_band_buckets("embedding", 64, 8).alias("b")).collect()
    assert all(len(r["b"]) == 8 for r in rows)
    assert all(0 <= v < 256 for r in rows for v in r["b"])
    # ...while the all-planes pack refuses to overflow its sign bit
    with _pytest.raises(ValueError, match="63"):
        srp_signature("embedding", 64)


def test_nan_embedding_is_quarantined(spark):
    """A corrupt vector (NaN component) must not rank in anyone's
    top-k nor mark itself a near-dup of every cell-mate — Spark orders
    NaN above every double, so an unguarded cosine would put it at
    rank 1 everywhere."""
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        cosine_self_topk,
        embedding_near_dup_pairs,
    )

    nan = float("nan")
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
        (9, [nan, 1.0, 0.0]),     # corrupt
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    topk = cosine_self_topk(df, "vec_id", "embedding", k=2, probe_ids=[0])
    neighbors = [r["neighbor_id"] for r in topk.collect()]
    assert 9 not in neighbors and neighbors[0] == 1

    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, "vec_id", "embedding", min_cosine=0.9
        ).collect()
    }
    assert all(9 not in p for p in pairs)
    assert (0, 1) in pairs


def test_srp_band_validation(spark):
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        srp_band_buckets,
        srp_signature,
    )

    with pytest.raises(ValueError, match="not divisible"):
        srp_band_buckets("v", 16, 3)
    with pytest.raises(ValueError, match="positive"):
        srp_band_buckets("v", 16, 0)
    with pytest.raises(ValueError, match="positive"):
        srp_signature("v", 0)


def test_ivf_training_survives_ragged_and_nan_vectors(spark):
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        train_ivf_centroids,
    )

    nan = float("nan")
    rows = [(i, [float(i % 3), 1.0, 0.5]) for i in range(12)]
    rows += [(100, [1.0]), (101, None), (102, [nan, 0.0, 0.0])]  # poison
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = train_ivf_centroids(df, "vec_id", "embedding", n_clusters=3, n_iter=2)
    got = cents.collect()
    assert len(got) == 3
    import math

    for r in got:
        assert all(math.isfinite(x) for x in r["centroid"])


def test_model_sampling_skips_corrupt_low_id_vectors(spark):
    """The deterministic-sample model paths collect the SMALLEST-id
    vectors as driver-resident state; corrupt rows at low ids used to
    crash training (float(None)) or silently seed a dead centroid /
    fix the wrong dim. finite_vectors must screen them out of
    sample_centroids, train_ivf_centroids seeds, and pq_codebooks —
    while staying a no-op on clean corpora (oracle re-derivation)."""
    from adi_226_datawarehouse_project_spark.operators.pq import pq_codebooks
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        finite_vectors,
        sample_centroids,
        train_ivf_centroids,
    )

    clean = [(10 + i, [float((i * 7 + j * 3) % 5 + 1) for j in range(4)]) for i in range(8)]
    corrupt = [
        (1, None),                               # NULL vector
        (2, [float("nan"), 1.0, 1.0, 1.0]),      # NaN component
        (3, [1.0, 2.0]),                         # ragged (wrong dim)
        (4, [0.0, 0.0, 0.0, 0.0]),               # zero norm (poisons PQ normalize)
    ]
    df = spark.createDataFrame(clean + corrupt, "id BIGINT, vec ARRAY<DOUBLE>")

    assert finite_vectors(df, "vec").count() == len(clean) + 2  # ragged+zero are finite
    cents = sample_centroids(df, "id", "vec", 4).collect()
    assert [r["centroid"] for r in cents] == [
        [1.0, 2.0],               # ragged is finite — screened later by dim checks
        [0.0, 0.0, 0.0, 0.0],     # zero-norm is finite; harmless as a cosine centroid
        clean[0][1],
        clean[1][1],
    ]

    # k-means training: seeds skip NULL/NaN, and dim is the MAJORITY
    # length over the candidate sample — the lone ragged row at id=3
    # must not set dim=2 for the whole model
    trained = train_ivf_centroids(df, "id", "vec", n_clusters=3, n_iter=2)
    got = trained.collect()
    assert len(got) == 3 and all(len(r["centroid"]) == 4 for r in got)

    # PQ codebooks: NULL/NaN/zero-norm all excluded (zero-norm
    # normalizes to all-NULL, which used to crash float())
    books = pq_codebooks(df, "id", "vec", m=2, ksub=4)
    assert len(books) == 2 and len(books[0]) == 4
    assert all(all(x == x for x in entry) for sub in books for entry in sub)


def test_train_ivf_raises_when_no_finite_vectors(spark):
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        train_ivf_centroids,
    )

    df = spark.createDataFrame(
        [(1, None), (2, [float("nan"), 1.0])], "id BIGINT, vec ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="no finite vectors"):
        train_ivf_centroids(df, "id", "vec", n_clusters=2, n_iter=1)


def test_tune_srp_bands_reaches_target(spark):
    """Self-calibration (r13 verdict task #1): the band ladder walks
    until sampled recall@k reaches the target; the report records the
    recall/candidate-cost curve for every rung it tried."""
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        tune_srp_bands,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    rep = tune_srp_bands(
        emb, "vec_id", "embedding", k=5, target_recall=0.9, sample_queries=25
    )
    assert rep["met"] is True
    assert rep["chosen_bands"] in (4, 8, 16)
    assert rep["curve"][-1]["recall_at_k"] >= 0.9
    for point in rep["curve"]:
        assert point["sample_candidates"] > 0
    # deterministic: same corpus + params → same report
    rep2 = tune_srp_bands(
        emb, "vec_id", "embedding", k=5, target_recall=0.9, sample_queries=25
    )
    assert rep == rep2


def test_tune_ivf_probes_exact_endpoint(spark):
    """The IVF ladder ends at n_probe == n_clusters (probe every cell),
    which is brute force — recall 1.0 by construction, so any target is
    reachable and ``met`` can only be False for SRP, never IVF."""
    from adi_226_datawarehouse_project_spark.operators.similarity import (
        tune_ivf_probes,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    rep = tune_ivf_probes(
        emb, "vec_id", "embedding", k=5, target_recall=1.0, n_clusters=8,
        probe_ladder=(2, 8), sample_queries=15,
    )
    assert rep["met"] is True
    assert rep["curve"][-1]["recall_at_k"] == 1.0
    # candidate cost grows with probes (candidate set is monotone in
    # n_probe for fixed centroids)
    cands = [p["sample_candidates"] for p in rep["curve"]]
    assert cands == sorted(cands)


def test_lsh_topk_target_recall_end_to_end(spark):
    """lsh_bucket_topk(target_recall=) must deliver the calibrated
    recall on the very sample it calibrated with — and stay a normal
    top-k frame."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    probes = list(range(20))
    exact = cosine_self_topk(
        emb, "vec_id", "embedding", k=5, probe_ids=probes
    ).collect()
    tuned = lsh_bucket_topk(
        emb, "vec_id", "embedding", k=5, probe_ids=probes,
        target_recall=0.9, sample_queries=25,
    ).collect()
    assert _recall(exact, tuned) >= 0.8  # calibration sample ≠ probe set
    assert {r["rank"] for r in tuned} <= set(range(1, 6))
