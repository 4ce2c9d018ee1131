"""Per-query phase profile: split each bench query's wall time into
(a) DataFrame construction (Python + py4j plan building),
(b) analysis (forced via df.schema — Catalyst analyzed plan), and
(c) execution (the bench's own consume method).

Usage: python scripts/profile_queries.py [query ...]
Runs after a full warehouse materialization, 3 trials per query,
prints per-phase medians. Purely diagnostic — never part of the bench.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from adi_226_datawarehouse_project_spark.measure import hash_consume  # noqa: E402
from adi_226_datawarehouse_project_spark.model.star import (  # noqa: E402
    materialize_warehouse,
)
from adi_226_datawarehouse_project_spark.session import get_spark  # noqa: E402

_HASH_CONSUME = {"text_token_features", "op_topk_orders_per_customer"}


def main() -> None:
    wanted = sys.argv[1:] or list(bench.BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_queries")
    materialize_warehouse(spark, "/root/testdata/sf0.001")  # JIT warm
    from adi_226_datawarehouse_project_spark.model import star as _star

    _star._REGISTERED.pop(id(spark), None)
    spark.catalog.clearCache()
    materialize_warehouse(spark, sf_dir)
    qs = bench.build_queries()
    out = {}
    for name in wanted:
        phases = {"build": [], "analyze": [], "execute": []}
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            _ = df.schema  # force analysis
            t2 = time.perf_counter()
            if name.startswith(("dedup_", "sim_")):
                df.count()
            elif name in _HASH_CONSUME:
                hash_consume(df)
            else:
                df.collect()
            t3 = time.perf_counter()
            phases["build"].append(t1 - t0)
            phases["analyze"].append(t2 - t1)
            phases["execute"].append(t3 - t2)
        med = {k: round(statistics.median(v), 3) for k, v in phases.items()}
        out[name] = med
        print(f"{name}: {med}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
