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


def test_fetch_with_retries_semantics():
    """Airflow-analog retry: N re-attempts with fixed delay, success
    stops early, exhaustion re-raises the last error."""
    from adi_226_datawarehouse_project_spark.sources.ingest import fetch_with_retries

    calls, sleeps = [], []

    def flaky_then_ok(url):
        calls.append(url)
        if len(calls) < 3:
            raise OSError(f"transient {len(calls)}")
        return [{"ok": 1}]

    wrapped = fetch_with_retries(
        flaky_then_ok, retries=2, retry_delay_s=60.0, sleep=sleeps.append
    )
    assert wrapped("u") == [{"ok": 1}]
    assert len(calls) == 3 and sleeps == [60.0, 60.0]

    def always_down(url):
        raise OSError("down")

    import pytest

    bad = fetch_with_retries(always_down, retries=2, retry_delay_s=1.0, sleep=sleeps.append)
    with pytest.raises(OSError, match="down"):
        bad("u")


def test_ingest_soda_with_retrying_fetcher(spark, tmp_path):
    """The retry wrapper composes with the pager: a fetcher that fails
    once per page still yields the full ingest."""
    import json as _json

    from adi_226_datawarehouse_project_spark.sources.ingest import (
        fetch_json,
        fetch_with_retries,
        ingest_soda,
    )

    f = tmp_path / "page.json"
    f.write_text(_json.dumps([{"unique_key": "1", "borough": "QUEENS"}]))
    url = f"file://{f}"
    fails = {"n": 0}

    def once_flaky(u):
        if fails["n"] == 0:
            fails["n"] += 1
            raise OSError("blip")
        return fetch_json(url)  # ignore paging params for the fixture

    df = ingest_soda(
        spark,
        "http://unused.example",
        expected_cols=["unique_key", "borough", "missing_col"],
        fetch=fetch_with_retries(once_flaky, retries=1, retry_delay_s=0.0, sleep=lambda s: None),
        max_pages=1,
    )
    (r,) = df.collect()
    assert r["borough"] == "QUEENS" and r["missing_col"] is None
