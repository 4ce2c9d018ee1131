"""Native geohash encoding — the reference's one nontrivial custom
scalar (`glue_job_clean_311.py:51-86`, duplicated in `Glue job to merge
311 Airbnb.py:36-71` and `airbnb_clean_data.py:79-120`), where it is a
row-at-a-time Python UDF. At 100 TB that UDF is the single worst
serialization hotspot in the pipeline (a Python round trip per row), so
here it is a pure Column/SQL arithmetic expression: Catalyst codegens it
JVM-side inside WholeStageCodegen — no Python workers at all.

Method: the classic per-bit bisection of the public geohash algorithm
is equivalent to quantizing longitude to ``ceil(5p/2)`` bits and
latitude to ``floor(5p/2)`` bits, interleaving the bits lon-first, and
emitting 5-bit groups as base32 chars. The only semantic difference is
at exact cell boundaries (bisection with strict ``>`` assigns a
boundary value to the lower cell; quantization assigns it to the upper
cell) — a measure-zero set for real-valued coordinates; tests verify
bit-exact agreement with the bisection oracle on the synthetic inputs.

The SQL generator is dialect-portable (plain arithmetic: floor/%/
least), so the exact same text runs in Spark SQL and in the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def encode_geohash_py(lat: float | None, lon: float | None, precision: int = 7) -> str | None:
    """Pure-Python bisection oracle (public geohash algorithm with the
    reference's strict-`>` boundary rule) — used only in tests."""
    if lat is None or lon is None:
        return None
    lat_range = [-90.0, 90.0]
    lon_range = [-180.0, 180.0]
    out: list[str] = []
    bits = 0
    bit = 0
    ch = 0
    while len(out) < int(precision):
        if bit % 2 == 0:
            mid = (lon_range[0] + lon_range[1]) / 2
            if lon > mid:
                ch |= 1 << (4 - bits)
                lon_range[0] = mid
            else:
                lon_range[1] = mid
        else:
            mid = (lat_range[0] + lat_range[1]) / 2
            if lat > mid:
                ch |= 1 << (4 - bits)
                lat_range[0] = mid
            else:
                lat_range[1] = mid
        bits += 1
        if bits == 5:
            out.append(BASE32[ch])
            bits = 0
            ch = 0
        bit += 1
    return "".join(out)


def _bit_counts(precision: int) -> tuple[int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2  # even interleave positions, lon first
    lat_bits = total // 2
    return lon_bits, lat_bits


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 7) -> str:
    """Dialect-portable SQL expression computing the geohash.

    ``lat_expr``/``lon_expr`` should be cheap expressions (ideally bare
    column references from an enclosing projection — the quantized
    values are inlined once per 5-bit group). NULL lat/lon → NULL
    geohash (NULL propagates through the arithmetic and concat).
    """
    lon_bits, lat_bits = _bit_counts(precision)
    qlon = (
        f"least(cast(floor((({lon_expr}) + 180.0) / 360.0 * {1 << lon_bits}.0) as bigint), "
        f"{(1 << lon_bits) - 1})"
    )
    qlat = (
        f"least(cast(floor((({lat_expr}) + 90.0) / 180.0 * {1 << lat_bits}.0) as bigint), "
        f"{(1 << lat_bits) - 1})"
    )
    chars: list[str] = []
    for c in range(precision):
        terms: list[str] = []
        for j in range(5):
            i = c * 5 + j  # global interleaved bit index, MSB first
            if i % 2 == 0:
                src, pos = qlon, lon_bits - 1 - i // 2
            else:
                src, pos = qlat, lat_bits - 1 - i // 2
            # Portable bit extraction: floor-div by 2^pos, mod 2.
            terms.append(f"(cast(floor(({src}) / {1 << pos}.0) as bigint) % 2) * {1 << (4 - j)}")
        val = " + ".join(terms)
        chars.append(f"substr('{BASE32}', cast(({val}) as int) + 1, 1)")
    # Explicit NULL guard: least()/greatest() IGNORE null args in both
    # dialects, so NULL lat/lon would otherwise quantize to the max
    # cell and emit a junk geohash instead of NULL.
    concat = " || ".join(chars)
    return (
        f"(CASE WHEN ({lat_expr}) IS NULL OR ({lon_expr}) IS NULL "
        f"THEN NULL ELSE ({concat}) END)"
    )


def geohash_col(lat: Column | str, lon: Column | str, precision: int = 7) -> Column:
    """PySpark Column form of :func:`geohash_sql` — pure JVM-side
    expression, fully inside WholeStageCodegen (no UDF)."""
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    lon_bits, lat_bits = _bit_counts(precision)
    qlon = F.least(
        F.floor((lon_c + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))).cast("bigint"),
        F.lit((1 << lon_bits) - 1),
    )
    qlat = F.least(
        F.floor((lat_c + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))).cast("bigint"),
        F.lit((1 << lat_bits) - 1),
    )
    chars: list[Column] = []
    for c in range(precision):
        val: Column = F.lit(0)
        for j in range(5):
            i = c * 5 + j
            if i % 2 == 0:
                src, pos = qlon, lon_bits - 1 - i // 2
            else:
                src, pos = qlat, lat_bits - 1 - i // 2
            bit = F.floor(src / F.lit(float(1 << pos))).cast("bigint") % 2
            val = val + bit * F.lit(1 << (4 - j))
        chars.append(F.substr(F.lit(BASE32), val.cast("int") + 1, F.lit(1)))
    # Same NULL guard as geohash_sql: least() ignores NULL operands.
    return F.when(lat_c.isNotNull() & lon_c.isNotNull(), F.concat(*chars))
