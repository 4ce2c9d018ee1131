"""URL curation operators: normalization edge cases (scheme, www,
userinfo, port, query, fragment, trailing slash, junk), blocklist
broadcast anti-join, and URL-level exact dedup with deterministic
winners and NULL-safe junk handling."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.operators.urls import (
    blocklist_filter,
    normalize_url,
    registrable_domain,
    url_dedup,
    url_host,
)


CASES = [
    ("https://www.Example.COM/a/b/?q=1#frag", "example.com", "example.com/a/b"),
    ("http://example.com/a/b", "example.com", "example.com/a/b"),
    ("https://user:pw@sub.news.example.org:8443/x/", "sub.news.example.org",
     "sub.news.example.org/x"),
    ("https://example.com", "example.com", "example.com"),
    ("https://example.com///", "example.com", "example.com"),
    ("ftp+ssh://Weird.Host/Path", "weird.host", "weird.host/Path"),  # path case kept
    ("not a url", None, None),
    ("", None, None),
    (None, None, None),
]


def test_host_and_normalize_edge_cases(spark):
    df = spark.createDataFrame(
        [Row(i=i, url=u) for i, (u, _, _) in enumerate(CASES)]
    )
    got = {
        r["i"]: (r["h"], r["n"])
        for r in df.select(
            "i",
            url_host("url").alias("h"),
            normalize_url("url").alias("n"),
        ).collect()
    }
    for i, (_, host, norm) in enumerate(CASES):
        assert got[i] == (host, norm), f"case {i}: {CASES[i]}"


def test_registrable_domain_last_two_labels(spark):
    df = spark.createDataFrame(
        [Row(url="https://a.b.news.example.org/x"), Row(url="https://foo.io/")]
    )
    got = sorted(
        r["d"] for r in df.select(registrable_domain("url").alias("d")).collect()
    )
    assert got == ["example.org", "foo.io"]


def test_blocklist_drops_domain_keeps_junk(spark):
    rows = [
        Row(id=1, url="https://spam.bad.com/x"),
        Row(id=2, url="https://www.bad.com/y"),
        Row(id=3, url="https://good.org/z"),
        Row(id=4, url="junk-not-a-url"),
    ]
    df = spark.createDataFrame(rows)
    blocked = spark.createDataFrame([("bad.com",)], "domain STRING")
    kept = blocklist_filter(df, "url", blocked)
    assert {r["id"] for r in kept.collect()} == {3, 4}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_url_dedup_min_id_wins_and_nulls_kept(spark):
    rows = [
        Row(id=5, url="https://www.example.com/a?utm=x"),
        Row(id=3, url="http://example.com/a/"),        # same normalized URL
        Row(id=9, url="https://example.com/b"),
        Row(id=7, url="broken"),                        # unparseable: kept
        Row(id=8, url="also broken"),                   # unparseable: kept
    ]
    df = spark.createDataFrame(rows)
    kept = url_dedup(df, "url", "id")
    assert {r["id"] for r in kept.collect()} == {3, 9, 7, 8}
    # dedup is partition-invariant
    kept2 = url_dedup(df.repartition(7), "url", "id")
    assert {r["id"] for r in kept2.collect()} == {3, 9, 7, 8}


def test_no_udf_in_url_chain(spark):
    df = spark.createDataFrame([Row(id=1, url="https://a.example/x")])
    blocked = spark.createDataFrame([("b.example",)], "domain STRING")
    out = url_dedup(blocklist_filter(df, "url", blocked), "url", "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
