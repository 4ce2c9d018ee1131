"""Market-basket co-occurrence: frequent item pairs with support + lift.

The classic warehouse affinity query ("parts bought together") and,
in the LLM-pipeline reading, the same shape as token/entity
co-occurrence mining over documents. Computed Spark-first:

    baskets --distinct--> (basket, item)
            --self equi-join on basket, item_a < item_b--> pairs
            --groupBy pair--> counts --filter support--> + lift

Scale design (100 TB):

- The self-join is an EQUI-join on the basket key; its fan-out is
  Σ |basket|² — bounded per basket, never a global cross product. The
  one hazard is a mega-basket (a key with millions of items):
  ``max_basket_size`` drops oversized baskets up front (the standard
  practice — a basket that large is a bot/aggregation artifact and
  would contribute |b|² garbage pairs). The drop is LOUD in the
  output contract (documented) rather than silent: the returned
  counts simply exclude those baskets.
- Item counts and the basket total are computed AFTER the size
  filter, so support and lift stay consistent with the pair universe.
- The basket total joins in as a 1-row broadcast (the repo's standard
  collect-free scalar pattern).
- Lift is published in exact integer terms (pair_count, count_a,
  count_b, n_baskets are all BIGINT) plus a portable floor-rounded
  double ``lift = pair_count·N / (count_a·count_b)`` — one exact
  integer product per side, one double division, identical op order
  in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BASKET_SIZE_DEFAULT = 1000


def copurchase_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_size: int = MAX_BASKET_SIZE_DEFAULT,
) -> DataFrame:
    """Frequent (item_a, item_b) pairs across baskets, with lift.

    Returns ``item_a < item_b`` pairs seen in at least
    ``min_pair_count`` distinct baskets: ``pair_count``, the
    per-item basket counts ``count_a``/``count_b``, ``n_baskets``
    (total baskets after the size filter), and ``lift`` (6-dp portable
    rounding; > 1 means the pair co-occurs more than independent
    popularity predicts).
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")

    b = baskets.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()

    sizes = b.groupBy("__basket").agg(F.count(F.lit(1)).alias("__sz"))
    b = b.join(
        sizes.where(F.col("__sz") <= max_basket_size).select("__basket"),
        "__basket",
    )

    item_counts = b.groupBy("__item").agg(F.count(F.lit(1)).alias("__cnt"))
    totals = b.agg(F.count_distinct("__basket").alias("n_baskets"))

    left = b.select("__basket", F.col("__item").alias("item_a"))
    right = b.select("__basket", F.col("__item").alias("item_b"))
    pairs = (
        left.join(right, "__basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )

    out = (
        pairs.join(
            item_counts.select(
                F.col("__item").alias("item_a"), F.col("__cnt").alias("count_a")
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col("__item").alias("item_b"), F.col("__cnt").alias("count_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
    )

    from ..functions.rounding import round6

    lift_raw = (F.col("pair_count") * F.col("n_baskets")).cast("double") / (
        F.col("count_a") * F.col("count_b")
    ).cast("double")
    return out.select(
        "item_a",
        "item_b",
        "pair_count",
        "count_a",
        "count_b",
        "n_baskets",
        round6(lift_raw).alias("lift"),
    )
