"""Live-ingestion path (S1/S6): paged SODA pull and JSON-record
ingestion, exercised fully offline via file:// URLs of recorded
responses — the identical urllib code path a live https:// pull uses."""

import json

import pytest

from adi_226_datawarehouse_project_spark.sources.ingest import (
    fetch_json,
    ingest_records,
    ingest_soda,
    soda_pages,
)

RECORDS = [
    {"unique_key": "1", "borough": "QUEENS", "complaint_type": "Noise"},
    {"unique_key": "2", "borough": "BRONX", "complaint_type": "Heat"},
    {"unique_key": "3", "borough": "QUEENS"},  # SODA omits null keys
]


def _record_file(tmp_path, name, records):
    p = tmp_path / name
    p.write_text(json.dumps(records))
    return p.as_uri()


def test_fetch_json_file_url(tmp_path):
    url = _record_file(tmp_path, "page.json", RECORDS)
    assert fetch_json(url) == RECORDS


def test_soda_pager_stops_on_short_page(tmp_path):
    pages = {0: RECORDS[:2], 2: RECORDS[2:]}  # offset -> page

    def fake_fetch(url):
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(url).query)
        assert q["$limit"] == ["2"]
        return pages.get(int(q["$offset"][0]), [])

    got = list(soda_pages("file:///x?$select=*", page_size=2, fetch=fake_fetch))
    assert got == [RECORDS[:2], RECORDS[2:]]  # short page terminates


def test_ingest_records_pads_contract(spark):
    df = ingest_records(
        spark, RECORDS[:2], expected_cols=["unique_key", "borough", "status"]
    )
    rows = df.select("unique_key", "borough", "status").collect()
    assert {r.unique_key for r in rows} == {"1", "2"}
    assert all(r.status is None for r in rows)  # padded typed NULL


def test_ingest_soda_end_to_end_offline(spark, tmp_path):
    """The full live path against a recorded response: page fetch →
    createDataFrame → contract padding → ordinary DataFrame ops.
    file:// URLs reject query strings, so the paging params the pager
    appends (correct for the live SODA endpoint) are stripped before
    the real fetch_json call."""
    url = _record_file(tmp_path, "soda.json", RECORDS)

    def fetch_recorded(paged_url):
        return fetch_json(paged_url.split("?")[0])

    df = ingest_soda(
        spark,
        url,
        expected_cols=["unique_key", "borough", "complaint_type", "status"],
        page_size=10,
        fetch=fetch_recorded,
    )
    assert df.count() == 3
    counts = {
        r.borough: r.n
        for r in df.groupBy("borough").count().withColumnRenamed("count", "n").collect()
    }
    assert counts == {"QUEENS": 2, "BRONX": 1}


def test_ingest_soda_empty_source_needs_shape(spark):
    def empty_fetch(url):
        return []

    with pytest.raises(ValueError, match="schema/expected_cols"):
        ingest_soda(spark, "file:///nope", fetch=empty_fetch)
    df = ingest_soda(
        spark, "file:///nope", expected_cols=["unique_key"], fetch=empty_fetch
    )
    assert df.columns == ["unique_key"] and df.count() == 0
