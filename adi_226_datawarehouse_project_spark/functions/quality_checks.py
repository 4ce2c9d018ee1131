"""Staging-zone data-quality validation — the reference's "Data
validated in staging tables before production load" (`README.md:179`)
and its typed-COPY WHERE guards (`nyc_hybrid_etl_pipeline.py:199,
220-222`) as a declarative, single-pass constraint checker (a
Deequ-lite over plain aggregates).

All declared constraints compile into ONE aggregation over the frame —
one job, one scan, map-side combinable — returning a row per
constraint with (name, kind, violations, total, passed). Uniqueness is
the exception: exact duplicate detection needs a grouped pass, so
``unique`` constraints add one extra groupBy job each (documented;
at 100 TB prefer ``approx_unique`` which stays in the single pass via
HLL with a declared tolerance).

Usage::

    report = check(df, [
        not_null("unique_key"),
        unique("unique_key"),              # extra grouped pass
        in_range("latitude", 40.4, 41.0),
        matches("unique_key", r"^[0-9]+$"),
        in_set("borough", ["QUEENS", "BRONX", ...]),
        approx_unique("unique_key"),       # single-pass, HLL tolerance
    ])
    # -> DataFrame(name, kind, violations, total, passed)
    require(spark_df, constraints)  # raises ValueError on any failure

``require`` is the load-gate form: the warehouse pipeline calls it
between staging and the dim/fact wave, so a malformed staging zone
stops the run instead of poisoning the warehouse — exactly where the
reference ran its manual staging checks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    kind: str
    # aggregate expression counting VIOLATIONS (None for grouped kinds)
    violations: Column | None = None
    # grouped-pass runner for kinds that need one (unique)
    grouped: Callable[[DataFrame], int] | None = None


def _count_where(pred: Column) -> Column:
    return F.sum(F.when(pred, 1).otherwise(0)).cast("bigint")


def not_null(col: str) -> Constraint:
    return Constraint(f"not_null({col})", "not_null", _count_where(F.col(col).isNull()))


def in_range(col: str, lo, hi) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"in_range({col},[{lo},{hi}])",
        "in_range",
        _count_where(c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))),
    )


def matches(col: str, pattern: str) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"matches({col},{pattern})",
        "matches",
        _count_where(c.isNotNull() & ~c.rlike(pattern)),
    )


def in_set(col: str, values: list) -> Constraint:
    # name embeds the allowed values (like in_range/matches embed their
    # parameters) so two in_set constraints on the same column with
    # different sets stay distinguishable in reports; when the shown
    # prefix truncates, a digest of the FULL list disambiguates sets
    # that agree on their first four values
    shown = ",".join(repr(v) for v in values[:4])
    if len(values) > 4:
        import hashlib

        digest = hashlib.md5(repr(values).encode()).hexdigest()[:8]
        shown += f",…#{digest}"
    c = F.col(col)
    # Strip Nones before isin(): a NULL in the IN-list makes every
    # non-match evaluate to NULL (SQL three-valued IN), ~NULL stays
    # NULL, and the violation count silently becomes 0 — the constraint
    # stops constraining entirely. NULL values themselves are already
    # exempt via the isNotNull() guard (in_set checks domain, not
    # nullability — compose with not_null for that), so a None in the
    # list is redundant-but-harmless once stripped.
    non_null_values = [v for v in values if v is not None]
    allowed = c.isin(non_null_values) if non_null_values else F.lit(False)
    return Constraint(
        f"in_set({col} ∈ {{{shown}}})",
        "in_set",
        _count_where(c.isNotNull() & ~allowed),
    )


def non_empty() -> Constraint:
    """Total row count must be > 0 (an empty staging zone usually means
    an upstream extract silently produced nothing)."""
    return Constraint("non_empty", "non_empty", F.lit(0).cast("bigint"))


def approx_unique(col: str, rel_tolerance: float = 0.05) -> Constraint:
    """Single-pass uniqueness via HLL: violation count is
    ``max(0, total − approx_distinct·(1+tol))`` — zero when the sketch
    (±tol) is consistent with all-distinct. The exact form is
    :func:`unique`; this one stays inside the one aggregation job."""
    v = F.greatest(
        F.lit(0).cast("bigint"),
        (
            F.count(F.lit(1))
            - (F.approx_count_distinct(col) * F.lit(1.0 + rel_tolerance)).cast(
                "bigint"
            )
        ),
    ).cast("bigint")
    return Constraint(f"approx_unique({col})", "approx_unique", v)


def unique(*cols: str) -> Constraint:
    """EXACT uniqueness over the key columns — needs its own grouped
    pass (one groupBy job; the only multi-job constraint kind)."""
    names = ",".join(cols)

    def run(df: DataFrame) -> int:
        dups = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("__extra"))
            .collect()[0]["__extra"]
        )
        return int(dups)

    return Constraint(f"unique({names})", "unique", None, run)


def check(df: DataFrame, constraints: list[Constraint]) -> list[dict]:
    """Evaluate every constraint; single-pass kinds share ONE
    aggregation job. Returns ``[{name, kind, violations, total,
    passed}, ...]`` in declaration order."""
    if not constraints:
        raise ValueError("at least one constraint required")
    single = [c for c in constraints if c.violations is not None]
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        c.violations.alias(f"__v{i}") for i, c in enumerate(single)
    ]
    row = df.agg(*aggs).collect()[0]
    total = int(row["__total"])
    # keyed by POSITION, not name — identically-named constraints
    # (e.g. two in_set on one column) must not collide
    by_pos = {id(c): int(row[f"__v{i}"] or 0) for i, c in enumerate(single)}
    out = []
    for c in constraints:
        if c.violations is not None:
            v = by_pos[id(c)]
            if c.kind == "non_empty":
                v = 0 if total > 0 else 1
        else:
            v = c.grouped(df)
        out.append(
            {
                "name": c.name,
                "kind": c.kind,
                "violations": v,
                "total": total,
                "passed": v == 0,
            }
        )
    return out


def require(df: DataFrame, constraints: list[Constraint]) -> list[dict]:
    """Gate form: run :func:`check`; raise ``ValueError`` naming every
    failed constraint (with counts) if any fails. Returns the report
    when everything passes."""
    report = check(df, constraints)
    failed = [r for r in report if not r["passed"]]
    if failed:
        detail = "; ".join(
            f"{r['name']}: {r['violations']}/{r['total']} rows" for r in failed
        )
        raise ValueError(f"staging validation failed — {detail}")
    return report
