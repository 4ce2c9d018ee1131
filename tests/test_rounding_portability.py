"""Pin of the r12 64×-sweep finding: engine-native ``round(x, d)``
diverges between Spark and DuckDB at large magnitudes, and the repo's
portable floor form does not.

The constant below is the PRODUCTION value that failed: op_q1's
``sum_charge`` unit sum for the (N, O) group on the 64× corpus.
x = N/1e6 ≈ 1.8e11; at that magnitude the 4th decimal sits at the
double's resolution edge, where Spark (BigDecimal over the shortest
decimal form) and DuckDB (multiply → nearest → divide on the binary
value) legitimately disagree by one printed digit. The
``floor(x·10^d + 0.5)/10^d`` convention (functions/rounding.py,
emitted by ``_sum_units``/``_avg_units`` in shared SQL text) is the
identical IEEE op sequence on both engines, so it agrees bitwise at
any magnitude."""

from __future__ import annotations

import duckdb

# sum(round(extprice·(1-disc)·(1+tax)·1e6)) for q1's (N, O) group at 64×
N_CHARGE = 180_818_597_572_594_944
SCALE = 1_000_000


def _duck(sql: str):
    return duckdb.connect().execute(sql).fetchone()[0]


def test_floor_form_agrees_across_engines_at_large_magnitude(spark):
    sf = spark.sql(
        f"SELECT floor(CAST({N_CHARGE}L AS DOUBLE)/{SCALE}.0 * 10000 + 0.5)"
        " / 10000 AS f"
    ).collect()[0]["f"]
    df = _duck(
        f"SELECT floor(CAST({N_CHARGE} AS DOUBLE)/{SCALE}.0 * 10000 + 0.5) / 10000"
    )
    assert repr(sf) == repr(df) == "180818597572.595"


def test_native_round_is_why_the_convention_exists(spark):
    """Canary: the native rounds DO diverge on this value today (Spark
    .5949, DuckDB .595). If an engine upgrade makes these agree, this
    pin may be retired — but the floor convention stays, because
    nothing guarantees agreement at other magnitudes."""
    sr = spark.sql(
        f"SELECT round(CAST({N_CHARGE}L AS DOUBLE)/{SCALE}.0, 4) AS r"
    ).collect()[0]["r"]
    dr = _duck(f"SELECT round(CAST({N_CHARGE} AS DOUBLE)/{SCALE}.0, 4)")
    assert repr(sr) == "180818597572.5949"
    assert repr(dr) == "180818597572.595"
