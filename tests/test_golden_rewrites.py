"""The aggregate-below-join rewrites of g07/g08 must be row-identical
to the reference's naive 4-way LEFT JOIN form. Both forms run in DuckDB
over the same derived star schema (sf0.01) — pure SQL-equivalence
check, no Spark involved."""

from conftest import SF_DIR

from oracle_harness import run_duckdb

from adi_226_datawarehouse_project_spark.model.star import oracle_with_chain
from adi_226_datawarehouse_project_spark.plans.golden import GOLDEN_QUERIES

NAIVE_G07 = """
SELECT al.borough,
       al.neighbourhood_name AS neighbourhood,
       COUNT(DISTINCT c.complaint_id) AS complaint_count,
       COUNT(DISTINCT f.listing_id) AS airbnb_count,
       round(CAST(COUNT(DISTINCT f.listing_id) AS DOUBLE)
             / nullif(CAST(COUNT(DISTINCT c.complaint_id) AS DOUBLE), 0.0), 4)
         AS airbnb_per_complaint
FROM dim_airbnb_location al
LEFT JOIN fact_airbnb_listings f ON f.geohash = al.geohash
LEFT JOIN dim_311_location l311 ON l311.geohash = al.geohash
LEFT JOIN fact_311_complaint c ON c.location_key = l311.location_key
WHERE al.borough IS NOT NULL
GROUP BY al.borough, al.neighbourhood_name
HAVING COUNT(DISTINCT c.complaint_id) > 10
ORDER BY airbnb_count DESC, al.borough, al.neighbourhood_name
LIMIT 50
"""

NAIVE_G08 = """
SELECT al.geohash,
       al.borough,
       COUNT(DISTINCT c.complaint_id) AS complaints,
       COUNT(DISTINCT f.listing_id) AS airbnb_listings,
       round(CAST(COUNT(DISTINCT c.complaint_id) AS DOUBLE)
             / nullif(CAST(COUNT(DISTINCT f.listing_id) AS DOUBLE), 0.0), 2)
         AS complaints_per_listing
FROM dim_airbnb_location al
LEFT JOIN fact_airbnb_listings f ON f.geohash = al.geohash
LEFT JOIN dim_311_location l311 ON l311.geohash = al.geohash
LEFT JOIN fact_311_complaint c ON c.location_key = l311.location_key
GROUP BY al.geohash, al.borough
HAVING COUNT(DISTINCT f.listing_id) > 5
ORDER BY complaints_per_listing DESC, al.geohash
LIMIT 30
"""


def _rows(sql):
    cols, rows = run_duckdb(oracle_with_chain(sql), SF_DIR)
    return cols, rows


def test_g07_rewrite_equivalent():
    naive_cols, naive_rows = _rows(NAIVE_G07)
    new_cols, new_rows = _rows(GOLDEN_QUERIES["g07_airbnb_complaint_ratio"])
    assert new_cols == naive_cols
    assert new_rows == naive_rows


def test_g08_rewrite_equivalent():
    naive_cols, naive_rows = _rows(NAIVE_G08)
    new_cols, new_rows = _rows(GOLDEN_QUERIES["g08_geohash_density"])
    assert new_cols == naive_cols
    assert new_rows == naive_rows


NAIVE_GEOHASH_MERGE = """
SELECT c.geohash,
       COUNT(DISTINCT c.unique_key) AS n_complaints,
       COUNT(DISTINCT a.id) AS n_airbnbs
FROM staging_311 c
JOIN staging_airbnb a ON a.geohash = c.geohash
GROUP BY c.geohash
ORDER BY n_complaints DESC, c.geohash
LIMIT 100
"""


def test_geohash_merge_rewrite_matches_naive():
    from adi_226_datawarehouse_project_spark.plans.operators_suite import (
        _GEOHASH_MERGE,
    )

    naive = run_duckdb(oracle_with_chain(NAIVE_GEOHASH_MERGE), SF_DIR)
    rewritten = run_duckdb(oracle_with_chain(_GEOHASH_MERGE), SF_DIR)
    assert naive == rewritten


# round-5 rewrites: g04/g05/g06 moved to the same aggregate-below-join
# shape after the raw m:n geohash join measured 3.9B pairs at a 64×-
# replicated corpus. The naive forms below are the PRE-rewrite texts.

NAIVE_G04 = """
SELECT al.borough,
       COUNT(*) AS total_listings,
       round(CAST(CAST(sum(CAST(round((try_cast(f.price AS DOUBLE)) * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             / count(try_cast(f.price AS DOUBLE)) / 100.0, 2) AS avg_price,
       min(try_cast(f.price AS DOUBLE)) AS min_price,
       max(try_cast(f.price AS DOUBLE)) AS max_price
FROM fact_airbnb_listings f
JOIN dim_airbnb_location al ON f.geohash = al.geohash
WHERE al.borough IS NOT NULL
  AND f.price NOT IN ('NaN', 'nan', '', 'INF', '-INF')
  AND try_cast(f.price AS DOUBLE) IS NOT NULL
GROUP BY al.borough
ORDER BY total_listings DESC, borough
"""

NAIVE_G05 = """
SELECT coalesce(f.room_type, dp.room_type) AS room_type,
       al.borough,
       COUNT(*) AS listing_count,
       round(CAST(CAST(sum(CAST(round((try_cast(f.price AS DOUBLE)) * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             / count(try_cast(f.price AS DOUBLE)) / 100.0, 2) AS avg_price
FROM fact_airbnb_listings f
JOIN dim_airbnb_location al ON f.geohash = al.geohash
LEFT JOIN dim_airbnb_property dp ON f.listing_id = dp.listing_id
WHERE al.borough IS NOT NULL
  AND f.price NOT IN ('NaN', 'nan', '', 'INF', '-INF')
  AND try_cast(f.price AS DOUBLE) IS NOT NULL
GROUP BY coalesce(f.room_type, dp.room_type), al.borough
ORDER BY listing_count DESC, room_type, borough
"""

NAIVE_G06 = """
SELECT al.neighbourhood_name AS neighbourhood,
       al.borough,
       COUNT(*) AS listings,
       round(CAST(CAST(sum(CAST(round((try_cast(f.price AS DOUBLE)) * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             / count(try_cast(f.price AS DOUBLE)) / 100.0, 2) AS avg_price,
       round(CAST(CAST(sum(CAST(round((coalesce(f.estimated_revenue_l365d, 0)) * 100, 0) AS BIGINT)) AS BIGINT)
             AS DOUBLE) / 100.0, 2) AS est_total_revenue_l365d
FROM fact_airbnb_listings f
JOIN dim_airbnb_location al ON f.geohash = al.geohash
WHERE f.price NOT IN ('NaN', 'nan', '', 'INF', '-INF')
GROUP BY al.neighbourhood_name, al.borough
ORDER BY listings DESC, neighbourhood, borough
LIMIT 20
"""


def test_g04_rewrite_equivalent():
    assert _rows(NAIVE_G04) == _rows(GOLDEN_QUERIES["g04_price_stats_by_borough"])


def test_g05_rewrite_equivalent():
    assert _rows(NAIVE_G05) == _rows(GOLDEN_QUERIES["g05_room_type_price"])


def test_g06_rewrite_equivalent():
    assert _rows(NAIVE_G06) == _rows(GOLDEN_QUERIES["g06_neighbourhood_revenue"])
