"""Skew-handling operators: salting for hot join/aggregation keys.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions; these explicit
operators cover the cases AQE can't: a broadcast-ineligible small side
joined on a pathologically hot key, and single-hot-key aggregations
where one reducer would otherwise own the whole key.

Salting scheme (the classic one): the big side gets a deterministic
per-row salt in [0, buckets); the small side is replicated once per
salt value; the join key becomes (key, salt), spreading each hot key
over `buckets` reducers. Aggregations do the same two-phase: partial
aggregate on (key, salt), final aggregate on key — sum/count/min/max
recombine exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _row_salt(df: DataFrame, buckets: int) -> Column:
    """Per-row salt: round-robin over a per-partition counter
    (``monotonically_increasing_id``). A content hash looked
    deterministic but defeated the operator's purpose on the exact
    workload it exists for — a hot key whose rows are byte-identical
    (repeated heartbeat rows) all hashed to ONE salt, leaving one
    reducer with the whole hot group. The salt value never affects
    results (the final agg/join recombines on the bare key), so
    nondeterminism across task retries is harmless; round-robin gives
    perfect spread for every content distribution."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(buckets))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Equi-join where `big`'s join keys are skewed and `small` cannot
    broadcast: salt the big side, replicate the small side ×buckets,
    join on keys+salt. For inner/left-family joins the result is
    row-identical to big.join(small, on, how) — verified by test —
    with each hot key spread over `buckets` shuffle partitions.

    right/full outer are rejected: unmatched small-side rows exist
    once per salt replica, so those joins would emit `buckets`
    duplicates per unmatched row.

    Cost model: small side shuffles ×buckets (choose buckets ≈ the
    hot-key imbalance factor, not more)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left-family joins only, got how={how!r}: "
            "the small side is replicated per salt, so right/full outer would "
            "duplicate unmatched small-side rows"
        )
    big_s = big.withColumn(_SALT, _row_salt(big, buckets))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = big_s.join(small_s, [*on, _SALT], how)
    return out.drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: list[str] | None = None,
    counts: bool = True,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial SUM/COUNT on
    (keys, salt), final recombine on keys. Exact for decomposable
    aggregates (sum/count; min/max trivially addable)."""
    sums = sums or []
    if not sums and not counts:
        raise ValueError(
            "salted_agg needs at least one aggregate: pass sums=[...] "
            "or counts=True"
        )
    salted = df.withColumn(_SALT, _row_salt(df, buckets))
    partial_aggs = [F.sum(c).alias(f"__s_{c}") for c in sums]
    if counts:
        partial_aggs.append(F.count("*").alias("__n"))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)
    final_aggs = [F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sums]
    if counts:
        final_aggs.append(F.sum("__n").cast("bigint").alias("n_rows"))
    return partial.groupBy(*keys).agg(*final_aggs)
