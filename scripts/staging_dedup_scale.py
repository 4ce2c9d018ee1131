"""Measure the staging_311 deterministic-dedup strategies at a given
corpus (VERDICT r14 task #4, guide §2/§8): the shipped form pays a
full-row window (shuffle every staging column by unique_key + per-
partition sort); the candidates are

  window   — shipped: row_number() OVER (PARTITION BY unique_key
             ORDER BY created_ts, closed_ts, lat, lon NULLS FIRST) = 1
  minstruct— one aggregate: min(struct(order keys..., payload...))
             per key (map-side partial agg, no sort-window; struct
             min compares fields asc-nulls-first = the window's
             ordering; payload fields only break FULL ties, which the
             window resolves arbitrarily — so this is deterministic
             where the window is not, identical where the window is
             deterministic)
A decide-keys-first variant (§8: narrow min(struct(order keys)) per
key + null-safe re-attach join) was measured INEXACT at sf0.01 —
43,854 rows vs the window's 43,848: the raw fixture contains rows
tied on (unique_key + all four order keys), which the re-attach join
keeps in full while row_number keeps one. Making it exact needs a
full-row DISTINCT after the join (a second full-row shuffle), which
is strictly more work than the window it replaces — variant closed,
finding recorded in OPTIMIZATION_r15.md.

Every variant's output is hash-compared against the window form each
round (count + xxhash64 over all columns); a mismatch aborts.
complaints_raw is cached first, as in the real build.

Usage: python scripts/staging_dedup_scale.py [sf_dir] [rounds]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from adi_226_datawarehouse_project_spark import dialect as D  # noqa: E402
from adi_226_datawarehouse_project_spark.model.star import (  # noqa: E402
    _STAGING_311_ORDER_KEYS,
    STAR_TABLES,
    _staging_311_parsed_sql,
    staging_311_derived_cols_sql,
    staging_311_sql,
)
from adi_226_datawarehouse_project_spark.session import get_spark  # noqa: E402
from adi_226_datawarehouse_project_spark.sources.catalog import (  # noqa: E402
    register_base_views,
)

_OUT_COLS = (
    "unique_key", "created_ts", "closed_ts", "agency", "borough",
    "complaint_type", "descriptor", "city", "status",
    "resolution_description", "latitude", "longitude",
)
_PAYLOAD = tuple(c for c in _OUT_COLS if c not in ("unique_key",) + _STAGING_311_ORDER_KEYS)


def _variant_sql(variant: str) -> str:
    d = D.SPARK
    parsed = _staging_311_parsed_sql(d)
    derived = staging_311_derived_cols_sql(d)
    if variant == "window":
        return staging_311_sql(d)
    if variant == "minstruct":
        fields = ", ".join(_STAGING_311_ORDER_KEYS + _PAYLOAD)
        sel = ", ".join(f"__w.{c} AS {c}" for c in _OUT_COLS if c != "unique_key")
        return f"""
SELECT unique_key, {sel}, {derived}
FROM (
  SELECT unique_key, min(struct({fields})) AS __w
  FROM ({parsed}) __c
  GROUP BY unique_key
) __r
"""
    raise ValueError(variant)


def _fingerprint(df) -> tuple[int, int]:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf_x64"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    variants = ("window", "minstruct")
    spark = get_spark("staging-dedup-scale")
    register_base_views(spark, sf_dir)
    spark.sql(STAR_TABLES["complaints_raw"](D.SPARK)).createOrReplaceTempView(
        "complaints_raw"
    )
    spark.catalog.cacheTable("complaints_raw")
    spark.table("complaints_raw").count()  # fill, as the build does

    # correctness gate first: every variant hash-equal to the window
    fps = {v: _fingerprint(spark.sql(_variant_sql(v))) for v in variants}
    assert len(set(fps.values())) == 1, f"variant outputs differ: {fps}"
    print(f"# all variants hash-equal: n={fps['window'][0]}", file=sys.stderr)

    walls: dict[str, list[float]] = {v: [] for v in variants}
    for r in range(rounds):
        for v in variants:
            df = spark.sql(_variant_sql(v))
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            walls[v].append(round(w, 3))
            print(f"# round {r} {v}: {w:.3f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows": fps["window"][0],
                "rounds": rounds,
                "walls": walls,
                "medians": {v: statistics.median(w) for v, w in walls.items()},
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
