"""URL-level curation — the front of a web-corpus pipeline (C4 and
successors curate by URL before ever reading the text): canonical URL
normalization, registrable-domain extraction, domain blocklist
filtering, and URL-level exact dedup.

Everything is pure Column expressions (regexp + string ops — no UDF,
narrow until the final dedup/filter joins):

- the blocklist join broadcasts the (small) blocked-domain set and
  anti-joins on the extracted domain — the corpus never shuffles;
- URL dedup is a per-URL min-id aggregation + semi join (the exact
  dedup pattern from ``operators/dedup.py`` keyed by normalized URL),
  both map-side combinable.

Caveat, documented: ``registrable_domain`` approximates the
registrable part as the last two dot-labels. A faithful version needs
the Public Suffix List (``co.uk`` etc.) — ship it as a broadcast join
against a PSL table where that matters; the fixture-facing form stays
dependency-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(url: Column | str) -> Column:
    """Lowercased host with any ``www.`` prefix, userinfo and port
    stripped; NULL when the value does not parse as a scheme://
    URL."""
    host = F.lower(F.regexp_extract(_col(url), _HOST_RE, 1))
    host = F.regexp_replace(host, r"^[^@]*@", "")  # userinfo
    host = F.regexp_replace(host, r":[0-9]+$", "")  # port
    host = F.regexp_replace(host, r"^www\.", "")
    return F.nullif(host, F.lit(""))


def normalize_url(url: Column | str) -> Column:
    """Canonical dedup key: ``host + path`` with scheme, www., query
    string, fragment and trailing slash removed, host lowercased (path
    case is preserved — it is significant on most servers). NULL for
    unparseable values, so junk never collides into one dedup
    bucket."""
    path = F.regexp_extract(_col(url), _PATH_RE, 1)
    path = F.regexp_replace(path, r"/+$", "")
    return F.when(
        url_host(url).isNotNull(), F.concat(url_host(url), path)
    )


def registrable_domain(url: Column | str) -> Column:
    """Last two dot-labels of the host (see module caveat re: PSL)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked_domains: DataFrame,
    domain_col: str = "domain",
) -> DataFrame:
    """Drop every row whose registrable domain appears in
    ``blocked_domains`` (a 1-column frame — broadcast; the corpus side
    stays where it is). Unparseable URLs are NOT dropped here — route
    them through a parse-validity filter explicitly so the two
    policies stay independent."""
    keyed = df.withColumn("__dom", registrable_domain(F.col(url_col)))
    blocked = blocked_domains.select(F.col(domain_col).alias("__dom"))
    return keyed.join(F.broadcast(blocked), "__dom", "left_anti").drop("__dom")


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row per normalized URL — the smallest id wins
    (deterministic, engine-portable). Rows whose URL fails to parse
    (normalized NULL) are all kept: an unparseable URL is not evidence
    of duplication."""
    keyed = df.withColumn("__nurl", normalize_url(F.col(url_col)))
    winners = (
        keyed.filter(F.col("__nurl").isNotNull())
        .groupBy("__nurl")
        .agg(F.min(id_col).alias(id_col))
    )
    kept = keyed.join(winners, ["__nurl", id_col], "left_semi")
    return kept.unionByName(keyed.filter(F.col("__nurl").isNull())).drop("__nurl")
