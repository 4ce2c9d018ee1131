"""Star-chain golden differential at scale under a SIZED session — the
g01 64× protocol (measurements/relational_oracles_x64.md "Star-chain
golden at 64×") generalized to any golden (r13 verdict task #4: g07's
drill-across aggregate-below-join topology is the one join shape g01's
proof does not exercise).

The 1g vanilla run_diff harness excludes star-building suites by
design (materializing the 64× warehouse OOMs the deliberately small
JVM); this protocol sizes the driver (16g / local[16]) and then runs
the SAME differential compare as the driver gate: registry query vs
its oracle_sql through tests/oracle_harness.compare_query — full-chain
value-hash equality, fixture expansion through staging, dims, fact,
and the final star join.

Usage::

    python scripts/golden_scale.py g07_airbnb_complaint_ratio \
        [/tmp/spark_graft_x64] [driver_mem=16g]

Prints one JSON line with the compare result and both walls.
"""

from __future__ import annotations

import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "tests"))


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "g07_airbnb_complaint_ratio"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_x64"
    driver_mem = sys.argv[3] if len(sys.argv) > 3 else "16g"
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", f"--driver-memory {driver_mem} pyspark-shell"
    )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from oracle_harness import run_duckdb

    qs = E.queries()
    oracle = E.oracle_sql()[name]

    # Spark side end-to-end (cold warehouse build + query), then the
    # DuckDB single-process re-derivation, then the driver-gate compare
    # on the already-collected frames.
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    s_cols, s_rows = df.columns, [tuple(r) for r in df.collect()]
    spark_wall = round(time.time() - t0, 1)

    t0 = time.time()
    d_cols, d_rows = run_duckdb(oracle, sf_dir)
    duck_wall = round(time.time() - t0, 1)

    from oracle_harness import _norm_rows

    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(sr, dr) if a != b]
    out = {
        "query": name,
        "sf_dir": sf_dir,
        "driver_mem": driver_mem,
        "cols_match": sc == dc,
        "rows": len(sr),
        "oracle_rows": len(dr),
        "value_match": sc == dc and len(sr) == len(dr) and not mism,
        "spark_wall_s_incl_build": spark_wall,
        "duckdb_wall_s": duck_wall,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    if mism:
        out["first_mismatch"] = repr(mism[0])[:400]
    print(json.dumps(out))
    sys.exit(0 if out["value_match"] else 1)


if __name__ == "__main__":
    main()
