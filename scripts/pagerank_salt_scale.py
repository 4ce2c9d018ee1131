"""Measure the PageRank hub-salting knob on an adversarial hub graph.

Synthesizes a graph where HALF of all edges point at one node (the
worst aggregation skew: a single hot groupBy(dst) key that AQE cannot
split) and times `pagerank` with and without ``salt_buckets``. Ranks
are asserted bit-identical between the two runs.

Usage::

    python scripts/pagerank_salt_scale.py [n_edges] [n_nodes] [buckets]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from adi_226_datawarehouse_project_spark.operators.graph import pagerank  # noqa: E402
from adi_226_datawarehouse_project_spark.session import get_spark  # noqa: E402

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
N_NODES = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
BUCKETS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
ITER = 4


def _consume(df) -> tuple[int, int]:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("node", "rank_units")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    # deterministic synthetic hub graph: even edge ids → hub 0, odd →
    # uniform spread; sources uniform
    e = spark.range(N_EDGES).select(
        (F.col("id") % N_NODES).alias("src"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.xxhash64("id") % N_NODES)
        .cast("bigint")
        .alias("dst"),
    )
    e = e.select("src", F.abs("dst").alias("dst")).persist()
    print(f"# edges={e.count():,} nodes<={N_NODES:,} hub share ~50%", file=sys.stderr)

    results = {}
    for label, kw in [("plain", {}), ("salted", {"salt_buckets": BUCKETS})]:
        best = float("inf")
        h = None
        for _ in range(2):
            t0 = time.perf_counter()
            n, h = _consume(pagerank(e, iterations=ITER, **kw))
            best = min(best, time.perf_counter() - t0)
        results[label] = (best, n, h)
        print(f"# {label}: {best:.2f}s rows={n} hash={h}", file=sys.stderr)

    assert results["plain"][2] == results["salted"][2], "ranks diverged!"
    print(
        {
            "n_edges": N_EDGES,
            "iterations": ITER,
            "buckets": BUCKETS,
            "plain_s": round(results["plain"][0], 2),
            "salted_s": round(results["salted"][0], 2),
            "speedup": round(results["plain"][0] / results["salted"][0], 2),
            "bit_identical": True,
        }
    )


if __name__ == "__main__":
    main()
