"""Live external-source ingestion (SURVEY §2.1 S1/S6 — the letter of
the reference's HTTP/SODA pull and document-store extract).

The reference pulls NYC 311 records from the Socrata Open Data API
(`src/311/nyc_ingestion_dag.py:45-52`: paged `$limit/$offset` GETs)
and extracts MongoDB documents to the lake (`src/Extract/
mongo_to_s3.py:25-26`) — in both cases OUTSIDE the query engine, as an
ingestion DAG that lands raw JSON in object storage. This engine keeps
that boundary (SURVEY §1.4): file-zone scans (`readers.read_json`) are
the default modeling, and this module is the thin LIVE path that
closes the loop for small/bounded pulls.

Scale posture, explicitly: paged HTTP ingestion is driver-side and
bounded by design — it exists for incremental tail pulls (e.g. "the
last day of 311 records"), not bulk history. At 100 TB the bulk path
is land-to-object-storage first (what the reference's DAG does), then
parquet scans; a driver-side HTTP loop would serialize the cluster
behind one socket. `ingest_records` turns each page into an Arrow-
backed DataFrame without touching disk.

Offline-testable: the fetcher is stdlib urllib, so a ``file://`` URL
of a recorded response exercises the identical code path with no
network or server (tests/test_ingest.py).
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..functions.cleaning import ensure_columns


def fetch_json(url: str, timeout: float = 30.0) -> list[dict]:
    """GET one JSON document (array-of-objects, the SODA shape).
    stdlib-only so the path works identically for http(s):// and the
    offline-test file:// scheme."""
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def fetch_with_retries(
    fetch=fetch_json,
    retries: int = 2,
    retry_delay_s: float = 60.0,
    backoff: float = 1.0,
    sleep=None,
):
    """Task-level retry semantics around a fetcher — the engine analog
    of the reference DAG's Airflow ``retries=2, retry_delay=60s``
    (`nyc_ingestion_dag.py:134-136`), applied at the page granularity
    where the engine owns the call. ``retries`` counts re-attempts
    AFTER the first try; delays are ``retry_delay_s * backoff**i``
    (backoff=1.0 reproduces Airflow's fixed delay). ``sleep`` is
    injectable for tests. Raises the LAST error once exhausted.
    The loop itself is the shared :func:`retry.call_with_retries`
    (same policy as the DAG runner's per-task retries)."""
    import time as _time

    from ..retry import call_with_retries

    do_sleep = _time.sleep if sleep is None else sleep

    def wrapped(url: str):
        return call_with_retries(
            lambda: fetch(url), retries, retry_delay_s, backoff, do_sleep
        )[0]

    return wrapped


def soda_pages(
    base_url: str,
    page_size: int = 1000,
    max_pages: int | None = None,
    fetch=fetch_json,
) -> Iterator[list[dict]]:
    """Socrata-style `$limit/$offset` pager (the reference DAG's loop,
    `nyc_ingestion_dag.py:45-52`): yields record pages until a short
    page, `max_pages`, or an empty response. `fetch` is injectable for
    tests."""
    offset = 0
    pages = 0
    while max_pages is None or pages < max_pages:
        sep = "&" if "?" in base_url else "?"
        url = f"{base_url}{sep}" + urllib.parse.urlencode(
            {"$limit": page_size, "$offset": offset}
        )
        records = fetch(url)
        if not records:
            return
        yield records
        pages += 1
        offset += page_size
        if len(records) < page_size:
            return


def ingest_records(
    spark: SparkSession,
    records: list[dict],
    expected_cols: list[str] | None = None,
    schema=None,
) -> DataFrame:
    """JSON records → DataFrame through the engine's schema contract
    (same `ensure_columns` padding as the file readers, P1). Without an
    explicit schema the records pass through spark.createDataFrame's
    sampler — fine for the bounded live path; bulk loads should give
    `schema` (one job instead of two, as with the file readers)."""
    if schema is not None:
        df = spark.createDataFrame(records, schema=schema)
    else:
        df = spark.createDataFrame(records)
    return ensure_columns(df, expected_cols) if expected_cols else df


def ingest_soda(
    spark: SparkSession,
    base_url: str,
    expected_cols: list[str] | None = None,
    schema=None,
    page_size: int = 1000,
    max_pages: int | None = None,
    fetch=fetch_json,
) -> DataFrame:
    """Paged SODA pull → one DataFrame (unionByName across pages,
    missing-column tolerant: SODA omits keys that are null for a whole
    page). Returns an empty contract-shaped frame when the source has
    no records (schema or expected_cols required in that case)."""
    out: DataFrame | None = None
    for page in soda_pages(base_url, page_size, max_pages, fetch):
        df = ingest_records(spark, page, expected_cols, schema)
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    if out is not None:
        return out
    if schema is not None:
        return spark.createDataFrame([], schema=schema)
    if expected_cols:
        return ensure_columns(
            spark.createDataFrame([], "ignored string").drop("ignored"), expected_cols
        )
    raise ValueError("empty source and no schema/expected_cols to shape the result")
