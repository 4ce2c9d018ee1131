"""Reference-shaped raw fixtures derived deterministically from the
driver's TPC-H-ish tables (FIXTURES.md §B/§C).

``complaints_raw`` (NYC-311 analog, from ``lineitem``) and
``listings_raw`` (Airbnb analog, from ``customer``) are defined ONCE as
dialect-rendered SQL so the Spark pipeline and the DuckDB oracle derive
bit-identical inputs. Every dirty-input behavior the reference's
cleaning layer handles is synthesized here:

- 4-way timestamp format rotation   (`glue_job_clean_311.py:40-46`)
- duplicate business keys           (`glue_job_clean_311.py:131`)
- non-numeric key values            (`nyc_hybrid_etl_pipeline.py:199`)
- case/whitespace dirt on borough/agency/type (`:127-129`)
- NULL + out-of-bbox lat/lon        (`:122-126`)
- currency-formatted prices + NaN/''/INF sentinels
                                    (`airbnb_clean_data.py:46-48`)
- NULLable ids for dropna           (`airbnb_clean_data.py:37`)

Float-parity rules: lat/lon are built as exact decimal STRINGS from
integer grids (never via double→string casts, whose shortest-repr
formatting differs between engines); stored doubles are integer/2^k or
integer/100 quotients so no round() is needed at construction time.

Spatial layout: complaints live on a 199×211 grid over the NYC bbox
with half the mass folded into the 13×17 sub-grid where all listings
live — guaranteeing dense geohash-join overlap (and realistic key skew
for AQE) at every scale factor. `loc_id` (the grid cell) functionally
determines city/borough/neighbourhood so location dims stay 1 row per
geohash cell.
"""

from __future__ import annotations

from ..dialect import SPARK, TS_FORMATS, repartition_hint

# Duplicate-seed folding: rows whose key matches take the previous
# key's seed. For LISTINGS every column derives from the seed alone,
# so the folded pair is a full-row duplicate and DISTINCT dedup is
# deterministic. For COMPLAINTS the pair shares unique_key but keeps
# each row's own `ship` (l_shipdate), so the payloads DIFFER — that is
# deliberate: it forces the staging dedup to be an ordered
# deterministic-keep (row_number over an explicit ORDER BY, see
# model/star.py staging_311 note), because vanilla dropDuplicates
# would be partition-order-dependent on exactly this shape.
_C_SEED = "(CASE WHEN k % 500 = 33 THEN k - 1 ELSE k END)"
_L_SEED = "(CASE WHEN k % 97 = 5 THEN k - 1 ELSE k END)"

_BOROUGHS = ["BROOKLYN", "MANHATTAN", "QUEENS", "BRONX", "STATEN ISLAND"]
_AGENCIES = ["NYPD", "DOT", "DEP", "DSNY", "HPD", "DOB"]
_COMPLAINT_TYPES = [
    "Noise - Residential",
    "Illegal Parking",
    "Heat/Hot Water",
    "Blocked Driveway",
    "Street Condition",
    "Water System",
    "Rodent",
    "Graffiti",
]
_PROPERTY_TYPES = ["Apartment", "House", "Loft", "Condo", "Townhouse", "Studio"]
_ROOM_TYPES = ["Entire home/apt", "Private room", "Shared room"]


def _case_mod(expr: str, n: int, values: list[str], pad_null: bool = False) -> str:
    branches = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    tail = "ELSE CAST(NULL AS STRING) " if pad_null or len(values) < n else ""
    return f"(CASE CAST(({expr}) % {n} AS INT) {branches} {tail}END)"


def _fmt_ts(dialect: str, expr: str, idx: int) -> str:
    """Format a timestamp in the idx-th of the four reference formats."""
    java, c = TS_FORMATS[idx]
    if dialect == SPARK:
        return f'date_format({expr}, "{java}")'
    return f"strftime({expr}, '{c}')"


# Exact-decimal coordinate strings from integer 1e-4 grids.
# lat ∈ {40.4 + i*0.003}, lon ∈ {-74.3 + j*0.0028}; out-of-bbox dirt
# adds 10 degrees (tests the bbox filter, `glue_job_clean_311.py:24-25`).
def _lat_str(lat_idx: str, seed: str, dirty: bool) -> str:
    e4 = f"(404000 + ({lat_idx}) * 30{f' + (CASE WHEN ({seed}) % 97 = 13 THEN 100000 ELSE 0 END)' if dirty else ''})"
    return (
        f"(substr(CAST({e4} AS STRING), 1, 2) || '.' || substr(CAST({e4} AS STRING), 3, 4))"
    )


def _lon_str(lon_idx: str, seed: str, dirty: bool) -> str:
    e4 = f"(743000 - ({lon_idx}) * 28{f' + (CASE WHEN ({seed}) % 97 = 41 THEN 100000 ELSE 0 END)' if dirty else ''})"
    return (
        f"('-' || substr(CAST({e4} AS STRING), 1, 2) || '.' || substr(CAST({e4} AS STRING), 3, 4))"
    )


def complaints_raw_sql(dialect: str) -> str:
    """NYC-311-shaped raw table from ``lineitem`` (~10 rows/order)."""
    seed = "seed"
    # Fold half of each axis into the listings' 13×17 sub-grid.
    lat_idx = "(CASE WHEN (seed * 7919) % 199 < 100 THEN (seed * 7919) % 199 ELSE ((seed * 7919) % 199) % 13 END)"
    lon_idx = "(CASE WHEN (seed * 104729) % 211 < 100 THEN (seed * 104729) % 211 ELSE ((seed * 104729) % 211) % 17 END)"
    borough_clean = _case_mod("loc_id", 5, _BOROUGHS)
    agency = _case_mod(seed, 6, _AGENCIES)
    ctype = _case_mod(seed, 8, _COMPLAINT_TYPES)
    fmt = [_fmt_ts(dialect, "created_local", i) for i in range(4)]
    closed_fmt = _fmt_ts(dialect, "closed_local", 0)
    return f"""
SELECT
  seed,
  CASE WHEN seed % 1000 = 17 THEN 'BAD-' || CAST(seed AS STRING)
       ELSE CAST(seed AS STRING) END AS unique_key,
  CASE CAST(seed % 4 AS INT)
       WHEN 0 THEN {fmt[0]} WHEN 1 THEN {fmt[1]}
       WHEN 2 THEN {fmt[2]} ELSE {fmt[3]} END AS created_date,
  CASE WHEN seed % 4 = 0 THEN CAST(NULL AS STRING)
       ELSE {closed_fmt} END AS closed_date,
  CASE WHEN seed % 2 = 0 THEN {agency} || ' ' ELSE {agency} END AS agency,
  CASE CAST(seed % 3 AS INT)
       WHEN 0 THEN lower({borough_clean})
       WHEN 1 THEN ' ' || {borough_clean} || ' '
       ELSE {borough_clean} END AS borough,
  CASE WHEN seed % 5 = 0 THEN {ctype} || '  ' ELSE {ctype} END AS complaint_type,
  'desc-' || CAST(seed % 20 AS STRING) AS descriptor,
  CASE WHEN seed % 11 = 0 THEN '' ELSE 'City-' || CAST(loc_id % 97 AS STRING) END AS city,
  CASE WHEN seed % 4 = 0 THEN 'Open' ELSE 'Closed' END AS status,
  CASE WHEN seed % 4 = 0 THEN CAST(NULL AS STRING)
       ELSE 'resolved-' || CAST(seed % 9 AS STRING) END AS resolution_description,
  CASE WHEN seed % 89 = 7 THEN CAST(NULL AS STRING)
       ELSE {_lat_str("lat_idx", "seed", True)} END AS latitude,
  CASE WHEN seed % 89 = 53 THEN CAST(NULL AS STRING)
       ELSE {_lon_str("lon_idx", "seed", True)} END AS longitude
FROM (
  SELECT {repartition_hint(dialect, "seed")}seed, lat_idx, lon_idx,
         lat_idx * 256 + lon_idx AS loc_id,
         ship + (720 + seed % 600) * INTERVAL '1' MINUTE AS created_local,
         ship + (720 + seed % 600) * INTERVAL '1' MINUTE
              + ((seed % 14) + 1) * 24 * INTERVAL '1' HOUR AS closed_local
  FROM (
    SELECT {_C_SEED} AS seed, ship, {lat_idx.replace("seed", _C_SEED)} AS lat_idx,
           {lon_idx.replace("seed", _C_SEED)} AS lon_idx
    FROM (
      SELECT l_orderkey * 10 + l_linenumber AS k, l_shipdate AS ship
      FROM lineitem
    ) __b
  ) __s
) __c
"""


def listings_raw_sql(dialect: str) -> str:  # noqa: ARG001 (dialect-symmetric)
    """Airbnb-shaped raw table from ``customer`` (1 row per customer)."""
    borough = _case_mod("loc_id", 5, _BOROUGHS)
    room = _case_mod("seed", 4, _ROOM_TYPES, pad_null=True)
    prop = _case_mod("seed", 6, _PROPERTY_TYPES)
    price_num = (
        "(CASE WHEN dollars >= 1000 THEN"
        " CAST(CAST(floor(dollars / 1000.0) AS BIGINT) AS STRING) || ',' ||"
        " lpad(CAST(dollars % 1000 AS STRING), 3, '0')"
        " ELSE CAST(dollars AS STRING) END"
        " || '.' || lpad(CAST(cents % 100 AS STRING), 2, '0'))"
    )
    return f"""
SELECT
  seed,
  CASE WHEN seed % 131 = 7 THEN CAST(NULL AS STRING) ELSE CAST(seed AS STRING) END AS id,
  'Listing ' || CAST(seed AS STRING) AS name,
  CASE WHEN seed % 127 = 3 THEN CAST(NULL AS STRING)
       ELSE {_lat_str("lat_idx", "seed", False)} END AS latitude,
  CASE WHEN seed % 127 = 67 THEN CAST(NULL AS STRING)
       ELSE {_lon_str("lon_idx", "seed", False)} END AS longitude,
  'nb-' || CAST(loc_id % 23 AS STRING) AS neighbourhood,
  'NBHD-' || CAST(loc_id % 37 AS STRING) AS neighbourhood_cleansed,
  CASE CAST(seed % 3 AS INT)
       WHEN 0 THEN lower({borough})
       WHEN 1 THEN {borough} || ' '
       ELSE {borough} END AS neighbourhood_group_cleansed,
  {room} AS room_type,
  {prop} AS property_type,
  CASE CAST(seed % 23 AS INT)
       WHEN 3 THEN 'NaN' WHEN 4 THEN '' WHEN 5 THEN 'INF'
       ELSE '$' || {price_num} END AS price,
  1 + seed % 29 AS minimum_minimum_nights,
  seed % 321 AS number_of_reviews,
  seed % 9 AS number_of_reviews_l30d,
  CAST(seed % 500 AS DOUBLE) / 100.0 AS reviews_per_month,
  3.0 + CAST(seed % 200 AS DOUBLE) / 100.0 AS review_scores_rating,
  3.0 + CAST(seed % 160 AS DOUBLE) / 80.0 AS review_scores_location,
  seed % 330 AS availability_eoy,
  seed % 10 > 0 AS has_availability,
  seed % 365 AS estimated_occupancy_l365d,
  CASE WHEN seed % 19 = 0 THEN CAST(NULL AS DOUBLE)
       ELSE CAST((seed * 97) % 100000 AS DOUBLE) / 100.0 END AS estimated_revenue_l365d,
  CAST(DATE '2023-01-01' + (seed % 500) * INTERVAL '1' DAY AS DATE) AS first_review,
  CASE WHEN seed % 13 = 0 THEN CAST(NULL AS DATE)
       ELSE CAST(DATE '2023-01-01' + (seed % 500 + seed % 200) * INTERVAL '1' DAY AS DATE) END AS last_review,
  CAST(DATE '2025-06-01' + (seed % 10) * INTERVAL '1' DAY AS DATE) AS last_scraped,
  CASE WHEN seed % 17 = 0 THEN CAST(NULL AS DATE)
       ELSE CAST(DATE '2015-01-01' + (seed % 3000) * INTERVAL '1' DAY AS DATE) END AS host_since,
  'Host-City-' || CAST(seed % 41 AS STRING) AS host_location,
  seed % 20 AS host_listings_count,
  seed % 20 + seed % 6 AS host_total_listings_count,
  1 + seed % 8 AS accommodates,
  0.5 + CAST(1 + seed % 3 AS DOUBLE) / 2.0 AS bathrooms,
  seed % 5 AS bedrooms,
  seed % 6 AS beds,
  CAST(seed % 100 AS DOUBLE) / 100.0 AS data_quality_score
FROM (
  SELECT seed, lat_idx, lon_idx, lat_idx * 256 + lon_idx AS loc_id,
         (seed * 37) % 490000 + 1000 AS cents,
         CAST(floor(((seed * 37) % 490000 + 1000) / 100.0) AS BIGINT) AS dollars
  FROM (
    SELECT {_L_SEED} AS seed,
           ({_L_SEED} * 7919) % 13 AS lat_idx,
           ({_L_SEED} * 104729) % 17 AS lon_idx
    FROM (SELECT c_custkey AS k FROM customer) __b
  ) __s
) __c
"""
