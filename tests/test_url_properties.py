"""Property test: normalize_url / url_host against an independent
urllib.parse-based Python reference over generated messy URLs."""

import urllib.parse

import hypothesis.strategies as st
from hypothesis import given, settings

from adi_226_datawarehouse_project_spark.operators.urls import normalize_url, url_host
from pyspark.sql import Row
from pyspark.sql import functions as F

label = st.from_regex(r"[a-zA-Z][a-zA-Z0-9-]{0,6}", fullmatch=True)
seg = st.from_regex(r"[a-zA-Z0-9._~-]{1,8}", fullmatch=True)

url_parts = st.fixed_dictionaries(
    {
        "scheme": st.sampled_from(["http", "https", "ftp"]),
        "www": st.booleans(),
        "user": st.one_of(st.none(), label),
        "host_labels": st.lists(label, min_size=1, max_size=3),
        "port": st.one_of(st.none(), st.integers(min_value=1, max_value=65535)),
        "path_segs": st.lists(seg, min_size=0, max_size=3),
        "trailing": st.integers(min_value=0, max_value=2),
        "query": st.one_of(st.none(), seg),
        "frag": st.one_of(st.none(), seg),
    }
)


def _build(p) -> str:
    host = ".".join(p["host_labels"])
    if p["www"]:
        host = "www." + host
    netloc = host
    if p["user"]:
        netloc = f"{p['user']}@{netloc}"
    if p["port"]:
        netloc = f"{netloc}:{p['port']}"
    path = "".join("/" + s for s in p["path_segs"]) + "/" * p["trailing"]
    url = f"{p['scheme']}://{netloc}{path}"
    if p["query"]:
        url += f"?{p['query']}"
    if p["frag"]:
        url += f"#{p['frag']}"
    return url


def _ref_host(url: str) -> str | None:
    sp = urllib.parse.urlsplit(url)
    host = (sp.hostname or "").lower()
    host = host[4:] if host.startswith("www.") else host
    return host or None


def _ref_norm(url: str) -> str | None:
    host = _ref_host(url)
    if host is None:
        return None
    path = urllib.parse.urlsplit(url).path.rstrip("/")
    return host + path


@settings(max_examples=30, deadline=None)
@given(parts=st.lists(url_parts, min_size=1, max_size=8))
def test_normalize_matches_urllib_reference(spark, parts):
    urls = [_build(p) for p in parts]
    df = spark.createDataFrame([Row(i=i, url=u) for i, u in enumerate(urls)])
    got = {
        r["i"]: (r["h"], r["n"])
        for r in df.select(
            "i", url_host("url").alias("h"), normalize_url("url").alias("n")
        ).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == (_ref_host(u), _ref_norm(u)), u
