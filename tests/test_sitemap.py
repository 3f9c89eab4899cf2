"""Sitemap protocol (operators/sitemap.py): urlset/sitemapindex parsing,
CDATA/entities, gzip bodies, and the WARC frame extraction."""

from __future__ import annotations

import gzip

from hbase_observer_es_spark.operators.sitemap import (
    parse_sitemap,
    warc_sitemap_urls,
)
from hbase_observer_es_spark.sources.warc import read_warc

from .warc_fixtures import http_response as _http
from .warc_fixtures import warc_record as _record

_URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://x.example/a</loc><lastmod>2024-01-02</lastmod></url>
  <url><loc> http://x.example/b?p=1&amp;q=2 </loc></url>
  <url><loc><![CDATA[http://x.example/c d]]></loc></url>
  <url><priority>0.5</priority></url>
</urlset>
"""


def test_urlset_parsing_entities_cdata_and_optional_fields():
    kind, entries = parse_sitemap(_URLSET)
    assert kind == "urlset"
    assert entries == [
        ("http://x.example/a", "2024-01-02"),
        ("http://x.example/b?p=1&q=2", None),
        ("http://x.example/c d", None),
    ]  # the loc-less <url> block is skipped


def test_sitemapindex_parsing():
    body = (
        b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<sitemap><loc>http://x.example/sm1.xml</loc>"
        b"<lastmod>2024-02-03</lastmod></sitemap>"
        b"<sitemap><loc>http://x.example/sm2.xml.gz</loc></sitemap>"
        b"</sitemapindex>"
    )
    kind, entries = parse_sitemap(body)
    assert kind == "sitemapindex"
    assert entries == [
        ("http://x.example/sm1.xml", "2024-02-03"),
        ("http://x.example/sm2.xml.gz", None),
    ]


def test_gzipped_sitemap_body():
    kind, entries = parse_sitemap(gzip.compress(_URLSET))
    assert kind == "urlset" and len(entries) == 3


def test_non_sitemap_and_corrupt_gzip_yield_nothing():
    assert parse_sitemap(b"<html><body>nope</body></html>") == ("", [])
    assert parse_sitemap(b"\x1f\x8bnot really gzip") == ("", [])


def test_no_entity_expansion_blowup():
    """A billion-laughs-style DTD must not expand — the regex extractor
    never resolves custom entities (they surface verbatim)."""
    bomb = (
        b'<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY a "ha"><!ENTITY b "&a;&a;">]>'
        b"<urlset><url><loc>http://x.example/&b;</loc></url></urlset>"
    )
    kind, entries = parse_sitemap(bomb)
    assert kind == "urlset"
    assert entries == [("http://x.example/&b;", None)]


def test_warc_sitemap_extraction_canonicalizes(spark, tmp_path):
    body = (
        b"<urlset><url><loc>HTTP://X.Example:80/a/../b</loc></url></urlset>"
    )
    shard = (
        _record(
            "response", _http(body, b"application/xml"),
            uri="http://x.example/sitemap.xml", rid="id:0",
        )
        + _record(
            "response", _http(b"<p>just a page</p>"),
            uri="http://x.example/page", rid="id:1",
        )
    )
    (tmp_path / "t.warc").write_bytes(shard)
    rows = warc_sitemap_urls(read_warc(spark, str(tmp_path))).collect()
    assert [(r.sitemap_uri, r.kind, r.loc, r.lastmod) for r in rows] == [
        ("http://x.example/sitemap.xml", "urlset", "http://x.example/b", None)
    ]
