"""Range (interval-containment) join — the second custom join Spark's
DataFrame API lacks a scalable plan for (beyond-reference addition, per
`SURVEY.md` §2.3 "not present in the reference": theta/range joins).

A naive ``points JOIN intervals ON p BETWEEN lo AND hi`` is a non-equi
join: Catalyst can only plan it as BroadcastNestedLoopJoin (O(|P|·|I|)
comparisons, and the broadcast side must fit in memory). The classic
distributed strategy is *binning*: quantize the domain into fixed-width
buckets, explode each interval to the buckets it overlaps, map each
point to its single bucket, equi-join on the bucket id, and re-check
the exact predicate. Cost is O(|P| + |I|·len/w + matches) with an
ordinary hash-partition shuffle — the same approach Databricks' range
join optimization and PostGIS tiling use.

Bucket width trades explode factor (≤ len/w + 1 rows per interval)
against join selectivity (points per bucket); pick it near the median
interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    p_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with
    ``lo <= p <= hi`` via bucket-explode equi-join.

    ``p_col``/``lo_col``/``hi_col`` must be numeric (cast timestamps to
    epoch first). Each point lands in exactly one bucket and an
    interval covers each of its buckets once, so no dedup pass is
    needed. The join predicate qualifies ``p_col``/``lo_col``/``hi_col``
    through the internal side aliases, so a name shared by both inputs
    cannot mis-resolve the condition; collisions in the OUTPUT columns
    remain the caller's responsibility (alias before joining).

    ``how`` accepts ``inner`` (default) and the point-side-preserving
    ``left``/``left_outer``. The exact range predicate lives in the
    JOIN CONDITION, not a post-join filter — a filter after a left
    join silently drops the unmatched point rows the left join exists
    to keep. Right/full outer are rejected: the interval side is
    EXPLODED (one row per covered bucket), so an unmatched interval
    would surface once per bucket instead of once.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"range_join supports inner/left joins only, got how={how!r}: "
            "the interval side is bucket-exploded, so right/full outer "
            "would emit one row per covered bucket for unmatched intervals"
        )

    def b(c: Column) -> Column:
        return F.floor(c / F.lit(float(bucket_width))).cast("bigint")

    # Backtick-quote the name everywhere it is referenced — in the
    # bucket derivations AND the join condition — so a column name
    # containing a dot (or other identifier-breaking chars) parses as
    # one top-level field, not as nested-field access (ADVICE r12; the
    # r13 review caught the derivations still unquoted). Embedded
    # backticks double per Spark's quoted-identifier rule (ADVICE r13:
    # a literal ` in the name would otherwise end the quote early).
    def qc(name: str) -> Column:
        return F.col("`" + name.replace("`", "``") + "`")

    pb = points.withColumn("__bucket", b(qc(p_col))).alias("__rj_p")
    ib = intervals.withColumn(
        "__bucket", F.explode(F.sequence(b(qc(lo_col)), b(qc(hi_col))))
    ).alias("__rj_i")

    def q(side: str, name: str) -> Column:
        return F.col(f"{side}.`" + name.replace("`", "``") + "`")

    cond = (
        (F.col("__rj_p.__bucket") == F.col("__rj_i.__bucket"))
        & (q("__rj_p", p_col) >= q("__rj_i", lo_col))
        & (q("__rj_p", p_col) <= q("__rj_i", hi_col))
    )
    joined = pb.join(ib, cond, how)
    return joined.drop("__bucket")
