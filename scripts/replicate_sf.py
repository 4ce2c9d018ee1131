"""Build a K×-replicated sf directory with the FULL table set, so the
headline bench suite and the corpus pipeline can run at sf1-equivalent
(and beyond) scale even though the generated testdata tops out at
sf0.1.

Replication policy (the salting rationale is scale_sweep.py's):

- ``documents``: per-copy token salt → shingle sets (near-)disjoint
  across copies; intra-copy duplicate structure repeats exactly K× so
  pair outputs scale linearly and wall time measures the operator.
  STOPWORD tokens keep their original form (the salt is stripped back
  off them): ``lang_id``/``quality_score`` are stopword-ratio
  heuristics, and fully-salted copies would all classify as unknown
  language and be dropped by the pipeline's clean stage — which
  silently turns a 64× pipeline run into a 1× run (observed). The
  shared all-stopword shingles this leaves across copies are far too
  sparse to reach any near-dup operating point (J contribution <3%).
- ``events``: event_id/user_id offset per copy → per-user session
  structure repeats; the fixed event-time span gets K× denser.
- ``embeddings``: vec_id offset; vectors copied verbatim (top-k and
  bucketing costs depend on count and distribution shape, not on
  vector novelty). For RECALL measurement the verbatim copies are a
  degenerate truth distribution (63 exact cosine-1.0 duplicates per
  vector — every banded scheme retrieves them; the r13 64× recall of
  1.0 on every leg was vacuous). ``--perturb-emb`` fixes that: copy 0
  stays verbatim; copy c > 0 adds deterministic pseudo-random noise
  (xxhash64(vec_id, i) → uniform [-1,1), scaled to the vector's own
  norm) at an epsilon cycling through ``_PERTURB_COS_BANDS`` — for
  near-orthogonal unit-scaled noise u, cos(v, v+εu) ≈ 1/√(1+ε²), so
  ε = √(1/t²−1) targets band t. Each base vector then has genuinely
  NEAR-but-not-identical neighbors spread across known cosine bands
  (~12 replicas per band at 64×), and recall@k measures retrieval of
  spread neighbors, not duplicate lookup. All copies cast the
  embedding to array<double> so the union is type-consistent.
- ``lineitem``/``orders``/``customer``: fact and mid-size dim keys
  offset per copy, with ``o_custkey`` re-pointed at the same copy's
  customers so per-customer order structure is constant — the TPC-H
  growth mode (facts and customers scale with SF).
- ``region``/``nation``/``part``/``supplier``: copied as-is (constant
  dims — fact references fan out K× per dim row, exactly what a
  bigger SF does to a small dimension).

Skewed mode (``--zipf``): real 100 TB corpora have hot keys (the
reference's NYC-311 data puts ~25% of complaints in one borough,
README.md:170); the uniform replication above never creates one, so
AQE skew handling and the aggregate-below-join plans were only ever
*mechanism*-tested (tests/test_skew.py), never measured at scale.
``--zipf`` keeps every table's TOTAL row count identical to the
uniform K× corpus but concentrates mass:

- ``lineitem``: (K - K/4) uniform copies + a HOT BLOCK of (K/4)·N
  synthetic single-lineitem orders whose keys all satisfy
  ``k = l_orderkey·10 + 1 ≡ s0 (mod 199·211)`` — the CRT residue that
  pins the fixtures' derived complaint grid cell (fixtures.py lat/lon
  hash) to ONE cell inside the 13×17 listings sub-grid. Result: ~25%
  of complaints_raw in one geohash cell = one borough (and because
  k % 10 == 1, the hot keys can never hit the ``%500==33`` dup-fold
  or ``%1000==17`` bad-key dirt branches). Hot-block orderkeys sit
  above the uniform key range and are NOT present in orders — the
  skew corpus stresses the complaints/listings star (warehouse_build,
  g01, g07, geohash rollup) and is not a lineitem⋈orders FK fixture.
- ``orders``: K uniform copies, but the top K/4 copies' ``o_custkey``
  all point at ONE customer — 25% of orders on a single hot key for
  the per-customer window/join paths.
- everything else: uniform, as above.

Stopword-hot text mode (``--zipf-text``): the key-skew mode above
leaves the DOCUMENT corpus uniform — every copy's shingles are salted
(near-)disjoint, so the shingle document-frequency distribution stays
flat and the n-gram join auto-selector
(``operators/dedup.py::_should_prefix_filter``) always sees a naive-
friendly corpus. Real web text is stopword-hot: a Zipf head of shared
tokens appears in nearly every document. ``--zipf-text`` appends to
each salted copy a per-language rotated stopword block (4 rotations of
the language's stopword list; ``zh`` gets a synthetic pinyin-ish list
since it has no Latin stopword set) — ~11 extra tokens on a ~50-token
doc, UNSALTED and shared across copies, so:

- hot-bigram document frequency ≈ N_lang/4 (tens of thousands at 64×)
  → Σdf²/Σdf blows past the auto threshold and the prefix plan must
  engage, while
- pairwise Jaccard between UNRELATED docs sharing a block stays
  ≈ 11/(2·60) ≈ 0.1, far under every operating threshold, so pair
  outputs still scale linearly with K (no quadratic blow-up, and the
  oracle comparison stays tractable).

Usage::

    python scripts/replicate_sf.py 64 [--sf /root/testdata/sf0.1] \
        [--out /tmp/spark_graft_sf_x64] [--zipf] [--zipf-text] \
        [--perturb-emb] [--tables embeddings,events]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from adi_226_datawarehouse_project_spark.session import get_spark  # noqa: E402
from adi_226_datawarehouse_project_spark.sources.catalog import load_table  # noqa: E402

COPY_AS_IS = ("region", "nation", "part", "supplier")


def _salted_text(c: int):
    """Per-copy token salt that PRESERVES stopword tokens (see module
    docstring). Two regexp passes: prefix every token, then strip the
    prefix back off (case-insensitive) stopword tokens."""
    from adi_226_datawarehouse_project_spark.functions.text import LANG_STOPWORDS

    if c == 0:
        return F.col("text")
    sw = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    salted = F.regexp_replace("text", r"(\S+)", f"c{c}$1")
    return F.regexp_replace(
        salted, rf"(^|\s)c{c}((?i:{'|'.join(sw)}))(?=\s|$)", "$1$2"
    )


_ZH_HOT = ["zhi", "de", "shi", "bu", "liao", "zai", "you", "wo", "ta", "men"]
_HOT_ROTATIONS = 4


def _hot_block(c: int):
    """Per-language rotated stopword block for --zipf-text (see module
    docstring). Rotation = (doc_id + copy) % R so the hot head is a
    small FAMILY of blocks per language (df varies across the head —
    Zipf-ish, not one degenerate shingle), and consecutive copies of
    the same doc get different rotations."""
    from adi_226_datawarehouse_project_spark.functions.text import LANG_STOPWORDS

    rot = (F.col("doc_id") + F.lit(c)) % _HOT_ROTATIONS
    expr = F.lit("")
    for lang, sw in list(LANG_STOPWORDS.items()) + [("zh", _ZH_HOT)]:
        blocks = F.array(
            *[
                F.lit(" " + " ".join(sw[r:] + sw[:r]))
                for r in range(_HOT_ROTATIONS)
            ]
        )
        expr = F.when(F.col("lang") == lang, F.element_at(blocks, rot.cast("int") + 1)).otherwise(expr)
    return expr


# target cosine bands for --perturb-emb replica noise (module docstring)
_PERTURB_COS_BANDS = (0.995, 0.98, 0.95, 0.9, 0.8)


def _perturbed_copy(emb: DataFrame, c: int, id_offset: int) -> DataFrame:
    """Copy ``c`` of the embeddings table with banded deterministic
    noise (``--perturb-emb``): copy 0 verbatim, copy c > 0 at the
    epsilon for band ``_PERTURB_COS_BANDS[(c-1) % len(bands)]``.
    Noise is a pure Column expression — xxhash64 of (offset vec_id,
    component index), identical on every executor, no state."""
    d = emb.select(
        (F.col("vec_id") + F.lit(c * id_offset)).alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
        "label",
    )
    if c == 0:
        return d
    t = _PERTURB_COS_BANDS[(c - 1) % len(_PERTURB_COS_BANDS)]
    eps = (1.0 / (t * t) - 1.0) ** 0.5
    d = d.withColumn(
        "__u",
        F.expr(
            "transform(sequence(0, size(embedding) - 1),"
            " i -> CAST(pmod(xxhash64(vec_id, i), 1048576) AS DOUBLE)"
            " / 524288.0D - 1.0D)"
        ),
    ).withColumn(
        "__s",
        F.expr(
            f"{eps!r}D * sqrt("
            " aggregate(zip_with(embedding, embedding, (x, y) -> x * y),"
            "           0.0D, (a, x) -> a + x)"
            " / aggregate(zip_with(__u, __u, (x, y) -> x * y),"
            "             0.0D, (a, x) -> a + x))"
        ),
    )
    return d.select(
        "vec_id",
        F.expr("zip_with(embedding, __u, (x, y) -> x + __s * y)").alias("embedding"),
        "label",
    )


def _stack(copies: list[DataFrame]) -> DataFrame:
    df = copies[0]
    for d in copies[1:]:
        df = df.unionByName(d)
    return df


def _offsets(spark: SparkSession, sf: str) -> dict[str, int]:
    out = {}
    for tbl, key in (
        ("documents", "doc_id"),
        ("events", "event_id"),
        ("events", "user_id"),
        ("embeddings", "vec_id"),
        ("lineitem", "l_orderkey"),
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
    ):
        out[key] = load_table(spark, sf, tbl).agg(F.max(key)).collect()[0][0] + 1
    return out


_GRID_MOD = 199 * 211  # the fixtures' seed→cell CRT modulus


def _hot_seed_residue(lat_idx: int = 5, lon_idx: int = 7) -> int:
    """The residue s0 with (s0·7919) % 199 == lat_idx and
    (s0·104729) % 211 == lon_idx — every seed ≡ s0 (mod 199·211) maps
    to grid cell (lat_idx, lon_idx) in fixtures.complaints_raw_sql.
    Defaults pick a cell inside the 13×17 listings sub-grid so the hot
    cell participates in every geohash join."""
    s_lat = (lat_idx * pow(7919, -1, 199)) % 199
    s_lon = (lon_idx * pow(104729, -1, 211)) % 211
    # CRT combine
    return (s_lat + 199 * (((s_lon - s_lat) * pow(199, -1, 211)) % 211)) % _GRID_MOD


def _hot_lineitem_block(spark: SparkSession, rows: int, key_base: int) -> DataFrame:
    """``rows`` synthetic single-lineitem orders whose complaint seeds
    (k = orderkey·10 + 1) all fall in the hot residue class. Orderkeys
    step by the modulus from a base above the uniform range, so keys
    stay distinct and the residue is preserved."""
    s0 = _hot_seed_residue()
    r0 = ((s0 - 1) * pow(10, -1, _GRID_MOD)) % _GRID_MOD
    base_m = key_base // _GRID_MOD + 1
    return spark.range(rows).select(
        (F.lit(r0) + (F.col("id") + F.lit(base_m)) * F.lit(_GRID_MOD)).alias("l_orderkey"),
        (F.col("id") % 2000 + 1).alias("l_partkey"),
        (F.col("id") % 100 + 1).alias("l_suppkey"),
        F.lit(1).cast("int").alias("l_linenumber"),
        (F.col("id") % 50 + 1).cast("double").alias("l_quantity"),
        ((F.col("id") % 90000) / 100.0 + 1000.0).alias("l_extendedprice"),
        ((F.col("id") % 11) / 100.0).alias("l_discount"),
        ((F.col("id") % 9) / 100.0).alias("l_tax"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")), (F.col("id") % 3 + 1).cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("O"), F.lit("F")), (F.col("id") % 2 + 1).cast("int")).alias("l_linestatus"),
        (F.lit("1995-01-10").cast("timestamp") + (F.col("id") % 2450).cast("int") * F.expr("INTERVAL 1 DAY")).alias("l_shipdate"),
    )


def replicate(
    spark: SparkSession,
    sf: str,
    mult: int,
    out: Path,
    zipf: bool = False,
    zipf_text: bool = False,
    perturb_emb: bool = False,
    tables: set[str] | None = None,
) -> None:
    """``tables=None`` builds the full set; a subset builds only those
    (e.g. {"embeddings"} for the ANN-recall corpus — no need to pay for
    a 153M-row lineitem stack to measure vector retrieval)."""

    def want(tbl: str) -> bool:
        return tables is None or tbl in tables

    out.mkdir(parents=True, exist_ok=True)
    for tbl in COPY_AS_IS:
        if not want(tbl):
            continue
        src = Path(sf) / f"{tbl}.parquet"
        dst = out / f"{tbl}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
    n = _offsets(spark, sf)

    if want("documents"):
        docs = load_table(spark, sf, "documents")
        _stack(
            [
                docs.select(
                    (F.col("doc_id") + F.lit(c * n["doc_id"])).alias("doc_id"),
                    (
                        F.concat(_salted_text(c), _hot_block(c))
                        if zipf_text
                        else _salted_text(c)
                    ).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
                for c in range(mult)
            ]
        ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    if want("events"):
        events = load_table(spark, sf, "events")
        _stack(
            [
                events.select(
                    (F.col("event_id") + F.lit(c * n["event_id"])).alias("event_id"),
                    (F.col("user_id") + F.lit(c * n["user_id"])).alias("user_id"),
                    "event_type",
                    "ts",
                    "value",
                    "props",
                )
                for c in range(mult)
            ]
        ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    if want("embeddings"):
        emb = load_table(spark, sf, "embeddings")
        _stack(
            [
                _perturbed_copy(emb, c, n["vec_id"])
                if perturb_emb
                else emb.select(
                    (F.col("vec_id") + F.lit(c * n["vec_id"])).alias("vec_id"),
                    "embedding",
                    "label",
                )
                for c in range(mult)
            ]
        ).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    if zipf and mult < 4:
        raise ValueError(
            f"--zipf needs mult >= 4 (mult={mult} would yield zero hot "
            "copies — a uniform corpus in a zipf-named directory)"
        )
    hot_copies = mult // 4 if zipf else 0

    if want("lineitem"):
        li = load_table(spark, sf, "lineitem")
        li_stacked = _stack(
            [
                li.select(
                    (F.col("l_orderkey") + F.lit(c * n["l_orderkey"])).alias("l_orderkey"),
                    *[col for col in li.columns if col != "l_orderkey"],
                )
                for c in range(mult - hot_copies)
            ]
        )
        if hot_copies:
            n_li = li.count()
            li_stacked = li_stacked.unionByName(
                _hot_lineitem_block(spark, hot_copies * n_li, mult * n["l_orderkey"] * 10)
            )
        li_stacked.write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    if want("orders"):
        orders = load_table(spark, sf, "orders")
        hot_ck = (
            load_table(spark, sf, "customer").agg(F.min("c_custkey")).collect()[0][0]
            if hot_copies
            else None
        )
        _stack(
            [
                orders.select(
                    (F.col("o_orderkey") + F.lit(c * n["o_orderkey"])).alias("o_orderkey"),
                    (
                        F.lit(hot_ck)
                        if c >= mult - hot_copies
                        else F.col("o_custkey") + F.lit(c * n["c_custkey"])
                    ).alias("o_custkey"),
                    *[col for col in orders.columns if col not in ("o_orderkey", "o_custkey")],
                )
                for c in range(mult)
            ]
        ).write.mode("overwrite").parquet(str(out / "orders.parquet"))

    if want("customer"):
        cust = load_table(spark, sf, "customer")
        _stack(
            [
                cust.select(
                    (F.col("c_custkey") + F.lit(c * n["c_custkey"])).alias("c_custkey"),
                    *[col for col in cust.columns if col != "c_custkey"],
                )
                for c in range(mult)
            ]
        ).write.mode("overwrite").parquet(str(out / "customer.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mult", type=int)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--zipf", action="store_true", help="skewed mode (see module docstring)")
    ap.add_argument(
        "--zipf-text", action="store_true",
        help="stopword-hot documents (see module docstring)",
    )
    ap.add_argument(
        "--perturb-emb", action="store_true",
        help="banded deterministic noise on embedding replicas (see module docstring)",
    )
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset of tables to build (default: all)",
    )
    args = ap.parse_args()
    suffix = (
        ("zipf_" if args.zipf else "")
        + ("zipftext_" if args.zipf_text else "")
        + ("perturb_" if args.perturb_emb else "")
    )
    out = Path(args.out or f"/tmp/spark_graft_sf_{suffix}x{args.mult}")
    spark = get_spark("replicate_sf", shuffle_partitions=32)
    t0 = time.time()
    replicate(
        spark, args.sf, args.mult, out, zipf=args.zipf, zipf_text=args.zipf_text,
        perturb_emb=args.perturb_emb,
        tables=set(args.tables.split(",")) if args.tables else None,
    )
    print(
        f"# replicated {args.sf} x{args.mult} zipf={args.zipf} "
        f"zipf_text={args.zipf_text} perturb_emb={args.perturb_emb} "
        f"tables={args.tables or 'all'} -> {out} in {time.time()-t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
