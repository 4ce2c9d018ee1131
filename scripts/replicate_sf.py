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
  vector novelty).
- ``lineitem``/``orders``/``customer``: fact and mid-size dim keys
  offset per copy, with ``o_custkey`` re-pointed at the same copy's
  customers so per-customer order structure is constant — the TPC-H
  growth mode (facts and customers scale with SF).
- ``region``/``nation``/``part``/``supplier``: copied as-is (constant
  dims — fact references fan out K× per dim row, exactly what a
  bigger SF does to a small dimension).

Usage::

    python scripts/replicate_sf.py 64 [--sf /root/testdata/sf0.1] \
        [--out /tmp/spark_graft_sf_x64]
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


def replicate(spark: SparkSession, sf: str, mult: int, out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    for tbl in COPY_AS_IS:
        src = Path(sf) / f"{tbl}.parquet"
        dst = out / f"{tbl}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
    n = _offsets(spark, sf)

    docs = load_table(spark, sf, "documents")
    _stack(
        [
            docs.select(
                (F.col("doc_id") + F.lit(c * n["doc_id"])).alias("doc_id"),
                _salted_text(c).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for c in range(mult)
        ]
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

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

    emb = load_table(spark, sf, "embeddings")
    _stack(
        [
            emb.select(
                (F.col("vec_id") + F.lit(c * n["vec_id"])).alias("vec_id"),
                "embedding",
                "label",
            )
            for c in range(mult)
        ]
    ).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    li = load_table(spark, sf, "lineitem")
    _stack(
        [
            li.select(
                (F.col("l_orderkey") + F.lit(c * n["l_orderkey"])).alias("l_orderkey"),
                *[col for col in li.columns if col != "l_orderkey"],
            )
            for c in range(mult)
        ]
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    orders = load_table(spark, sf, "orders")
    _stack(
        [
            orders.select(
                (F.col("o_orderkey") + F.lit(c * n["o_orderkey"])).alias("o_orderkey"),
                (F.col("o_custkey") + F.lit(c * n["c_custkey"])).alias("o_custkey"),
                *[col for col in orders.columns if col not in ("o_orderkey", "o_custkey")],
            )
            for c in range(mult)
        ]
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))

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
    args = ap.parse_args()
    out = Path(args.out or f"/tmp/spark_graft_sf_x{args.mult}")
    spark = get_spark("replicate_sf", shuffle_partitions=32)
    t0 = time.time()
    replicate(spark, args.sf, args.mult, out)
    print(f"# replicated {args.sf} x{args.mult} -> {out} in {time.time()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
