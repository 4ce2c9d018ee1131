"""Portable 6-decimal rounding — the repo-wide cross-engine
convention, previously re-implemented inline in four operators
(gapfill, funnel, market_basket, quality_model).

``floor(x * 1e6 + 0.5) / 1e6`` instead of engine-native ``round(x, 6)``:
native round is not reproducible on exact half-way ties (Spark rounds
the shortest decimal form HALF_UP, DuckDB rounds the binary double),
and integer-unit ratios DO produce exact ties. The floor form is the
same IEEE op sequence on every engine, so the DuckDB oracles agree
bitwise. Any change here must be mirrored in every oracle SQL that
re-derives a rounded value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1_000_000


def round6(x: Column) -> Column:
    """Portable HALF-UP rounding of ``x`` to 6 decimals (see module
    docstring for why not ``F.round``)."""
    return F.floor(x * _SCALE + F.lit(0.5)) / _SCALE
