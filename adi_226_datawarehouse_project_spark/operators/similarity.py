"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path is
random-hyperplane LSH bucketing (Charikar 2002 SRP) so candidate
generation is an equi-join on bucket signatures instead of a cross
join.

Determinism: dot products use ``F.aggregate`` (a sequential
index-order fold), not a shuffled SUM — so scores are bit-identical
run-to-run and engine-to-engine, which the DuckDB differential oracle
relies on.

Scale notes: brute force is O(|Q|·|N|) — fine when one side is small
(probe set) and broadcastable; self-join all-pairs must go through
LSH. Signature planes are deterministic pseudo-random (seeded from
plane×dim via a splitmix-style integer mix, computed as literal-free
Column arithmetic) so they're identical across runs and executors
without broadcasting any state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold dot-product — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled to a flat expression chain for a KNOWN
    dimension — same left-to-right summation order as the ``_dot``
    fold (bit-identical doubles), but ~5× faster in hot all-pairs
    loops: per-element HOF lambda dispatch is replaced by plain
    codegen'd multiply-adds."""
    out: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        out = out + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
    return out


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.nullif(_norm(a) * _norm(b), F.lit(0.0))


def cosine_self_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    probe_ids: list[int] | None = None,
    allow_full_scan: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe row. The probe side
    is broadcast: the big side streams once, no shuffle of the corpus.

    `probe_ids=None` means ALL rows probe — an O(n²) all-pairs scan
    that is only sane on small corpora, so it must be opted into with
    `allow_full_scan=True`; the scale paths for the no-probe-set case
    are `lsh_bucket_topk` / `ivf_topk`."""
    if probe_ids is None and not allow_full_scan:
        raise ValueError(
            "cosine_self_topk with probe_ids=None is an O(n²) all-pairs scan; "
            "pass allow_full_scan=True explicitly, or use lsh_bucket_topk/"
            "ivf_topk for sublinear candidate generation"
        )
    probes = df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    if probe_ids is not None:
        probes = probes.filter(F.col("query_id").isin(probe_ids))
    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv"))
    scored = (
        corpus.join(F.broadcast(probes), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__nv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_component(plane: int, dim_index: Column) -> Column:
    """Deterministic ±1 hyperplane component from (plane, dim):
    xxhash64 integer mix → sign. Same value on every executor, no
    state to ship."""
    h = F.xxhash64(F.lit(plane), dim_index)
    return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def srp_signature(vec: Column, num_planes: int = 16) -> Column:
    """Signed-random-projection bit signature packed into a bigint."""
    sig = F.lit(0).cast("bigint")
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * _plane_component(p, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return sig


def lsh_bucket_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    num_planes: int = 16,
    bands: int = 4,
    probe_ids: list[int] | None = None,
) -> DataFrame:
    """Approximate top-k: SRP signature → banded buckets → equi-join
    candidates → exact cosine re-rank within candidates. The join is
    on (band, sub-signature) — shuffle-partitioned, never a cross
    join; recall is tuned by num_planes/bands."""
    bits_per_band = num_planes // bands
    mask = (1 << bits_per_band) - 1
    with_sig = df.select(
        F.col(id_col), F.col(vec_col), srp_signature(F.col(vec_col), num_planes).alias("__sig")
    )
    banded = with_sig.select(
        id_col,
        vec_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sig"), b * bits_per_band).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    probes = banded.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "band", "bucket"
    )
    if probe_ids is not None:
        probes = probes.filter(F.col("query_id").isin(probe_ids))
    corpus = banded.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv"), "band", "bucket"
    )
    cand = (
        corpus.join(probes, ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "__qv", "neighbor_id", "__nv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cosine", cosine(F.col("__qv"), F.col("__nv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    probe_ids: list[int] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path
    next to SRP-LSH: partition the corpus into coarse cells, search
    only the ``n_probe`` most promising cells per query.

    Coarse centroids are a deterministic sample (the ``n_clusters``
    smallest ids) rather than k-means output, so results are
    bit-reproducible across runs and executors with zero training
    state; a production build swaps in k-means centroids without
    touching the plan shape. Every vector is assigned to its
    max-cosine centroid (broadcast argmax — the centroid table is tiny
    by construction); queries probe their ``n_probe`` best cells and
    candidates come from an equi-join on ``centroid_id`` — a
    shuffle-partitioned join over ~n_probe/n_clusters of the corpus,
    never a cross join. Exact cosine re-ranks candidates.
    """
    cent_w = Window.orderBy(F.col("centroid_id_src"))
    centroids = (
        df.select(F.col(id_col).alias("centroid_id_src"), F.col(vec_col).alias("__cv"))
        .orderBy("centroid_id_src")
        .limit(n_clusters)
        .withColumn("centroid_id", F.row_number().over(cent_w) - 1)
        .select("centroid_id", "__cv")
    )

    def _cells(side: DataFrame, id_alias: str, vec_alias: str, n: int) -> DataFrame:
        scored = side.join(F.broadcast(centroids)).withColumn(
            "__ccos", cosine(F.col(vec_alias), F.col("__cv"))
        )
        w = Window.partitionBy(id_alias).orderBy(
            F.col("__ccos").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= n)
            .select(id_alias, vec_alias, "centroid_id")
        )

    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv"))
    assigned = _cells(corpus, "neighbor_id", "__nv", 1)  # inverted lists
    probes = df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    if probe_ids is not None:
        probes = probes.filter(F.col("query_id").isin(probe_ids))
    probed = _cells(probes, "query_id", "__qv", n_probe)

    cand = (
        assigned.join(probed, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "__qv", "neighbor_id", "__nv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("cosine", cosine(F.col("__qv"), F.col("__nv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, min_cosine: float = 0.95, num_planes: int = 16
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) via SRP
    buckets + exact re-score — the embedding flavor of dedup."""
    sig = df.select(
        F.col(id_col), F.col(vec_col), srp_signature(F.col(vec_col), num_planes).alias("__sig")
    )
    a = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), F.col("__sig"))
    b = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), F.col("__sig"))
    return (
        a.join(b, "__sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
