"""Crawl-front URL operators: canonicalization and URL-level dedup.

Web-scale training pipelines dedup by URL BEFORE fetching or parsing a
byte of body text (the cheapest dedup there is — CommonCrawl index
pipelines and the CCNet/RefinedWeb preprocessing stacks all start here).
The same page is re-crawled under trivially different URLs: scheme/host
case, an explicit default port, a ``#fragment``, tracking query
parameters (``utm_*``, ``fbclid``, ``gclid``), query-parameter order,
and a trailing slash. Canonicalization collapses those variants to one
key; dedup is then an exact hash-aggregate on the key.

Everything here is pure JVM column expressions (regexp/string/lambda
functions) — at 100 TB this runs inside whole-stage codegen over the
scan with only the url + id columns read, and the dedup is ONE
shuffle on the canonical-url hash (uniform keys, no skew). The suite
oracle replays every transform in DuckDB over the identical fixture.

Deliberately NOT merged (documented policy, same as the big public
pipelines): ``http`` vs ``https`` (different resources in general),
``www.`` vs bare host (site-dependent), percent-encoding case (the
fixture never emits mixed-case escapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# query parameters dropped by canonicalization (tracking/session noise);
# LIKE patterns so the Spark lambda and the DuckDB twin stay dialect-free
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")


def synth_urls(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic messy-URL fixture from ``(doc_id, source)`` — the
    ingest-fixture convention of multimodal.synth_png / text.synth_html:
    every 4 consecutive doc_ids form one canonical-URL group, dressed as
    four crawl-duplicate variants:

      v0: clean            https://site<g%7>.example.com/arts/item<g>?id=<g>&lang=en
      v1: shouty + port    HTTPS://SITE<g%7>.Example.COM:443/arts/item<g>?id=<g>&lang=en#frag
      v2: trailing slash + utm   .../item<g>/?lang=en&id=<g>&utm_source=feed
      v3: tracking tail    .../item<g>?id=<g>&fbclid=x<g>&lang=en&ref=rss

    (v2 also swaps the query-parameter order, so canonical equality
    requires the sort step.) The SQL twin rebuilds the identical
    strings, so every canonicalization decision is independently
    replayable."""
    g = (F.col(id_col) / 4).cast("long")
    v = F.pmod(F.col(id_col), F.lit(4))
    site = F.pmod(g, F.lit(7))
    base = F.concat(
        F.lit("site"), site, F.lit(".example.com"),
    )
    path = F.concat(F.lit("/arts/item"), g)
    url = (
        F.when(v == 0, F.concat(
            F.lit("https://"), base, path,
            F.lit("?id="), g, F.lit("&lang=en")))
        .when(v == 1, F.concat(
            F.lit("HTTPS://SITE"), site, F.lit(".Example.COM:443"), path,
            F.lit("?id="), g, F.lit("&lang=en#frag")))
        .when(v == 2, F.concat(
            F.lit("https://"), base, path,
            F.lit("/?lang=en&id="), g, F.lit("&utm_source=feed")))
        .otherwise(F.concat(
            F.lit("https://"), base, path,
            F.lit("?id="), g, F.lit("&fbclid=x"), g,
            F.lit("&lang=en&ref=rss")))
    )
    return df.select(F.col(id_col), url.alias("url"))


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Add ``canonical_url``: fragment stripped, scheme+host lowercased,
    default port removed (``:80`` for http, ``:443`` for https),
    tracking query parameters dropped, surviving parameters sorted,
    path trailing slash trimmed.

    Pure string/regexp/higher-order expressions — no UDF, no shuffle;
    the whole transform is one codegen'd projection over the scan.
    """
    u = F.regexp_replace(F.col(url_col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    host = (
        F.when(
            (scheme == "http"), F.regexp_replace(hostport, ":80$", "")
        )
        .when(
            (scheme == "https"), F.regexp_replace(hostport, ":443$", "")
        )
        .otherwise(hostport)
    )
    # path+query = everything after the authority
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^([^?]*)", 1), "/$", ""
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (
                    ~p.startswith("utm_")
                    & ~p.startswith("fbclid=")
                    & ~p.startswith("gclid=")
                    & ~p.startswith("ref=")
                    & (p != "")
                ),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return df.select(
        F.col(id_col), F.col(url_col), canon.alias("canonical_url")
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup: one row per canonical URL —
    ``(doc_id, canonical_url, n_variants)`` with the smallest doc_id
    kept (the reference pipelines keep the earliest crawl).

    Scale shape: canonicalization is a projection; the dedup is a
    single hash-aggregate shuffle on the canonical string (at 100 TB,
    group on ``h60(canonical)`` first if canonical strings are long —
    here they are bounded and the oracle compares the strings
    themselves)."""
    canon = canonicalize_urls(df, url_col=url_col, id_col=id_col)
    return canon.groupBy("canonical_url").agg(
        F.min(id_col).cast("long").alias(id_col),
        F.count(F.lit(1)).cast("long").alias("n_variants"),
    ).select(id_col, "canonical_url", "n_variants")
