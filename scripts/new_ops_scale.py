"""Scale datapoints for the round-5 late additions (gap-fill, quality
classifier, PageRank): wall time at 1x (sf0.1) vs a replicated Kx dir
(scripts/replicate_sf.py output), plus the fitted exponent
alpha = log(wall_Kx / wall_1x) / log(K).

Usage::

    python scripts/new_ops_scale.py [K] [--x /tmp/spark_graft_sf_x64]
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from adi_226_datawarehouse_project_spark.session import get_spark  # noqa: E402
from adi_226_datawarehouse_project_spark.plans.operators_suite import (  # noqa: E402
    _spark_copurchase,
    _spark_gapfill,
    _spark_graph_pagerank,
    _spark_quality_classifier,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
X_DIR = "/tmp/spark_graft_sf_x64"
for i, a in enumerate(sys.argv):
    if a == "--x" and i + 1 < len(sys.argv):
        X_DIR = sys.argv[i + 1]

QUERIES = {
    "op_gapfill_interpolate": _spark_gapfill,
    "text_quality_classifier": _spark_quality_classifier,
    "op_graph_pagerank": _spark_graph_pagerank,
    "op_copurchase_pairs": _spark_copurchase,
}


def _consume(df) -> int:
    """Hash-reduce (shared implementation: measure.hash_consume) —
    defeats Catalyst's count()-driven join/projection pruning while a
    single row crosses py4j."""
    from adi_226_datawarehouse_project_spark.measure import hash_consume

    return hash_consume(df)


def main() -> None:
    spark = get_spark(
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    )
    # warm the JVM the same way bench.py does
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        n = _consume(fn(spark, "/root/testdata/sf0.1"))
        base[name] = time.time() - t0
        print(f"RESULT 1x {name}: {base[name]:.2f}s rows={n}", flush=True)
    for name, fn in QUERIES.items():
        t0 = time.time()
        n = _consume(fn(spark, X_DIR))
        wall = time.time() - t0
        alpha = math.log(wall / base[name]) / math.log(K)
        print(
            f"RESULT {K}x {name}: {wall:.2f}s rows={n} alpha={alpha:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
