"""HTML→text extraction (operators/html_text.py): golden semantics over
adversarial markup, charset handling, and the WARC → documents-shaped
map-only Spark path."""

from __future__ import annotations

import gzip

import pytest

from hbase_observer_es_spark.operators.html_text import (
    decode_http_html,
    html_to_text,
    warc_html_documents,
)
from hbase_observer_es_spark.sources.warc import read_warc


# ---------------------------------------------------------------- pure goldens


def test_basic_tag_strip_and_blocks():
    html = "<html><body><p>First  para</p><p>Second</p><div>Third</div></body></html>"
    assert html_to_text(html) == "First para\n\nSecond\n\nThird"


def test_inline_tags_vanish_without_breaking_words():
    assert html_to_text("<b>bo</b>ld and <i>italic</i> text") == "bold and italic text"


def test_script_style_head_and_comments_emit_nothing():
    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><script>var x = '<p>not text</p>';</script>"
        "<!-- a comment --><noscript>enable js</noscript>"
        "<template><p>spare</p></template><p>real</p></body></html>"
    )
    assert html_to_text(html) == "real"


def test_entities_decode_exactly_once():
    # &amp;lt; must become the four characters "&lt;", never "<"
    assert html_to_text("<p>a &amp;lt; b &lt; c &#65; &#x42; &nbsp;d</p>") == (
        "a &lt; b < c A B d"
    )


def test_nested_and_malformed_nesting_is_tolerated():
    html = "<div><p>open<div>inner</p>deep</div>tail"
    # best-effort: all text survives, block boundaries respected
    assert html_to_text(html) == "open\ninner\ndeep\ntail"


def test_truncated_html_yields_text_up_to_the_cut():
    assert html_to_text("<p>hello wor<b") == "hello wor"
    assert html_to_text("<p>hello &am") == "hello &am"


def test_attribute_containing_gt_is_not_text():
    assert html_to_text('<a title="a>b" href="#">link</a> end') == "link end"


def test_table_cells_space_rows_break():
    """Cells separate with spaces; row boundaries are block boundaries, and
    ADJACENT block tags (</tr><tr>, like </p><p>) consistently yield one
    paragraph break — one rule for every block tag."""
    html = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    assert html_to_text(html) == "a b\n\nc"


def test_list_items_break_lines():
    assert html_to_text("<ul><li>one</li><li>two</li></ul>") == "one\n\ntwo"


def test_br_and_pre_preserve_line_structure():
    assert html_to_text("line1<br>line2<br/>line3") == "line1\nline2\nline3"


def test_whitespace_collapses_but_paragraphs_survive():
    html = "<p>a\n\n\n   b</p>\n\n\n\n<p>c</p>"
    assert html_to_text(html) == "a b\n\nc"


# ------------------------------------------------------------ charset handling


from .warc_fixtures import http_response as _http  # noqa: E402


def test_charset_from_http_header():
    body = "café".encode("latin-1")
    html = decode_http_html(_http(body, b"text/html; charset=ISO-8859-1"))
    assert html == "café"


def test_unknown_charset_falls_back_to_utf8_replace():
    body = b"ok \xff\xfe"
    html = decode_http_html(_http(body, b"text/html; charset=not-a-codec"))
    assert html is not None and html.startswith("ok ")


def test_meta_charset_used_when_header_has_none():
    body = ('<html><head><meta charset="iso-8859-1"></head>'
            "<body><p>café</p></body></html>").encode("latin-1")
    html = decode_http_html(_http(body, b"text/html"))
    assert "café" in html


def test_meta_http_equiv_charset_form():
    body = ('<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=iso-8859-1"></head>'
            "<body><p>naïve</p></body></html>").encode("latin-1")
    assert "naïve" in decode_http_html(_http(body, b"text/html"))


def test_header_charset_wins_over_meta():
    # header says latin-1; meta lies utf-8 — header is authoritative
    body = ('<meta charset="utf-8"><p>café</p>').encode("latin-1")
    html = decode_http_html(_http(body, b"text/html; charset=ISO-8859-1"))
    assert "café" in html


def test_meta_charset_outside_first_1024_bytes_is_ignored():
    body = b"<html><head>" + b"<!-- pad -->" * 100 + \
        '<meta charset="iso-8859-1"></head><body><p>caf\xe9</p></body></html>'.encode("latin-1")
    html = decode_http_html(_http(body, b"text/html"))
    assert "caf�" in html  # utf-8 replace, meta too late per the spec


def test_non_html_content_type_returns_none():
    assert decode_http_html(_http(b'{"a":1}', b"application/json")) is None
    assert decode_http_html(_http(b"\x89PNG", b"image/png")) is None


def test_payload_without_http_envelope_is_the_document():
    assert decode_http_html(b"<p>bare</p>") == "<p>bare</p>"


# ------------------------------- round-10 review repros (implied tags, codings)


def test_implied_head_close_keeps_the_body():
    """</head> is omissible per the HTML spec; <body> implies it. The body
    of such a page must extract, not vanish into a stuck skip state."""
    html = "<html><head><title>t</title><body><p>hello world</p></body></html>"
    assert html_to_text(html) == "hello world"


def test_implied_head_open_still_drops_title():
    """<head> is also omissible: a bare <title> before any body content is
    head boilerplate, not corpus text."""
    html = '<html><title>My Site</title><meta name="a"><p>body text</p>'
    assert html_to_text(html) == "body text"


def test_unclosed_title_does_not_swallow_the_document():
    html = "<html><head><title>oops no close tag<body><p>kept</p>"
    assert html_to_text(html) == "kept"


def test_identity_content_encoding_is_a_noop():
    payload = _http(b"<p>fine page</p>", b"text/html",
                    b"Content-Encoding: identity\r\n")
    assert html_to_text(decode_http_html(payload)) == "fine page"


def test_layered_transfer_encoding_gzip_chunked_decodes_fully():
    """'Transfer-Encoding: gzip, chunked' unwraps last-first: de-chunk, then
    inflate — the full RFC 7230 layering in one header."""
    body = b"<p>layered</p>"
    blob = gzip.compress(body)
    payload = _http(
        _chunked(blob, [len(blob)]), b"text/html",
        b"Transfer-Encoding: gzip, chunked\r\n",
    )
    assert html_to_text(decode_http_html(payload)) == "layered"


def test_partially_undone_transfer_encoding_yields_no_document():
    """If only the chunked layer unwraps (the gzip layer is corrupt), the
    remaining token must stay visible and the page must NOT extract as
    compression noise."""
    from hbase_observer_es_spark.sources.warc import http_message

    payload = _http(
        _chunked(b"not actually gzip", [17]), b"text/html",
        b"Transfer-Encoding: gzip, chunked\r\n",
    )
    headers, got = http_message(payload)
    assert headers.get("transfer-encoding") == "gzip"
    assert got == b"not actually gzip"  # chunked layer removed, gzip kept
    assert decode_http_html(payload) is None


def test_missing_content_type_requires_html_signature():
    """No Content-Type header: a recognizable HTML signature extracts; a
    binary payload must not land as replacement-character soup."""
    html_payload = b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\n<!DOCTYPE html><p>ok</p>"
    assert html_to_text(decode_http_html(html_payload)) == "ok"
    png_payload = b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\n\x89PNG\r\n\x1a\n\xff\xfe"
    assert decode_http_html(png_payload) is None


def test_bare_payload_honors_meta_charset():
    """A payload with no HTTP envelope (e.g. a WARC conversion record) gets
    the same charset sniffing as enveloped bodies."""
    body = '<meta charset="iso-8859-1"><p>café</p>'.encode("latin-1")
    assert "café" in decode_http_html(body)


# ------------------------------------- HTTP transfer/content coding (RFC 7230)


def _chunked(body: bytes, sizes: list[int]) -> bytes:
    out = bytearray()
    pos = 0
    for n in sizes:
        out += format(n, "x").encode() + b"\r\n" + body[pos : pos + n] + b"\r\n"
        pos += n
    assert pos == len(body)
    out += b"0\r\n\r\n"
    return bytes(out)


def test_chunked_transfer_encoding_is_removed():
    from hbase_observer_es_spark.sources.warc import http_message

    body = b"<p>chunked page content</p>"
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + _chunked(body, [10, 13, 4])
    )
    headers, got = http_message(payload)
    assert got == body
    assert "transfer-encoding" not in headers
    assert html_to_text(decode_http_html(payload)) == "chunked page content"


def test_chunk_extensions_and_hex_sizes():
    from hbase_observer_es_spark.sources.warc import http_message

    body = b"x" * 0x1A + b"y" * 3
    framed = (
        b"1a;ext=1\r\n" + b"x" * 0x1A + b"\r\n3\r\nyyy\r\n0\r\n"
        b"Trailer: t\r\n\r\n"
    )
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + framed
    )
    _, got = http_message(payload)
    assert got == body


def test_malformed_chunk_stream_falls_back_to_raw():
    from hbase_observer_es_spark.sources.warc import http_message

    raw = b"not actually chunked"
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + raw
    )
    headers, got = http_message(payload)
    assert got == raw  # record-level tolerance: raw bytes, not a crash
    assert "transfer-encoding" in headers  # the lie is still visible


def test_gzip_content_encoding_is_decompressed():
    from hbase_observer_es_spark.sources.warc import http_message

    body = b"<p>compressed page</p>"
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gzip.compress(body)
    )
    headers, got = http_message(payload)
    assert got == body and "content-encoding" not in headers
    assert html_to_text(decode_http_html(payload)) == "compressed page"


def test_deflate_content_encoding_both_wrappings():
    import zlib

    from hbase_observer_es_spark.sources.warc import http_message

    body = b"<p>deflated</p>"
    # zlib-wrapped and raw deflate both occur in the wild
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    raw_deflate = co.compress(body) + co.flush()
    for blob in (zlib.compress(body), raw_deflate):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + blob
        )
        _, got = http_message(payload)
        assert got == body


def test_chunked_then_gzip_layering():
    """Transfer coding is removed first, then content coding — the RFC
    ordering; both undone in one pass."""
    body = b"<p>both layers</p>"
    blob = gzip.compress(body)
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n\r\n"
        + _chunked(blob, [len(blob)])
    )
    assert html_to_text(decode_http_html(payload)) == "both layers"


def test_undecodable_content_encoding_yields_no_document():
    # LZW `compress` is the remaining coding with no decoder; a corrupt
    # brotli body behaves the same way (the br token stays visible)
    for token, noise in ((b"compress", b"\x1f\x9d\x90abc"),
                         (b"br", b"\x1b\x2c\x00\x10")):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: " + token + b"\r\n\r\n" + noise
        )
        assert decode_http_html(payload) is None  # never extract noise


def test_brotli_content_encoding_decodes():
    """`Content-Encoding: br` decodes via pyarrow's bundled brotli codec
    (r16) — modern crawls are majority brotli."""
    import pyarrow as pa

    from hbase_observer_es_spark.sources.warc import http_message

    html = b"<html><body><p>brotli page body</p></body></html>"
    comp = pa.Codec("brotli").compress(html, asbytes=True)
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: br\r\n\r\n" + comp
    )
    headers, body = http_message(payload)
    assert body == html
    assert "content-encoding" not in headers
    assert "brotli page body" in decode_http_html(payload)


def test_zstd_content_encoding_decodes():
    """`Content-Encoding: zstd` decodes through the repo's own RFC 8878
    decoder; a corrupt frame leaves the token visible."""
    from hbase_observer_es_spark.operators.zstd import compress_zstd
    from hbase_observer_es_spark.sources.warc import http_message

    html = b"<html><body><p>zstd page body</p></body></html>"
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: zstd\r\n\r\n" + compress_zstd(html)
    )
    headers, body = http_message(payload)
    assert body == html
    assert "content-encoding" not in headers
    bad = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: zstd\r\n\r\nnot zstd"
    )
    headers, body = http_message(bad)
    assert headers["content-encoding"] == "zstd" and body == b"not zstd"


def test_corrupt_gzip_body_stays_raw_and_yields_no_document():
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\nnot gzip at all"
    )
    assert decode_http_html(payload) is None


# --------------------------------------------------------- robots noindex gate


def test_noindex_detection_attribute_orders():
    from hbase_observer_es_spark.operators.html_text import is_noindexed

    assert is_noindexed('<meta name="robots" content="noindex, nofollow">')
    assert is_noindexed("<meta content='NOINDEX' name=robots>")
    assert is_noindexed('<META NAME=ROBOTS CONTENT="noindex">')
    assert not is_noindexed('<meta name="robots" content="nofollow">')
    assert not is_noindexed("<p>the word noindex in body text</p>")
    assert not is_noindexed('<meta name="viewport" content="noindex-like">')


def test_noindexed_page_is_dropped_from_the_corpus(spark, tmp_path):
    page = _http(
        b'<html><head><meta name="robots" content="noindex"></head>'
        b"<body><p>opted out</p></body></html>"
    )
    shard = _record("response", page, uri="http://x.example/private", rid="id:7") + _record(
        "response", _http(b"<p>public page</p>"), uri="http://x.example/pub", rid="id:8"
    )
    (tmp_path / "t.warc").write_bytes(shard)
    rows = warc_html_documents(read_warc(spark, str(tmp_path))).collect()
    assert [r.text for r in rows] == ["public page"]


# ------------------------------------------------------------ link extraction


def test_extract_links_resolution_and_filtering():
    from hbase_observer_es_spark.operators.html_text import extract_links

    html = (
        '<a href="/about">About us</a>'
        '<a href="b.html">Rel</a>'
        '<a href="https://other.example/x#frag">Ext</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="#top">self</a>'
        '<a href="/priv" rel="nofollow">no</a>'
    )
    got = extract_links(html, "http://x.example/dir/page.html")
    assert got == [
        ("http://x.example/about", "About us"),
        ("http://x.example/dir/b.html", "Rel"),
        ("https://other.example/x", "Ext"),
    ]


def test_extract_links_honors_base_href():
    from hbase_observer_es_spark.operators.html_text import extract_links

    html = '<base href="http://cdn.example/assets/"><a href="img/a.html">x</a>'
    assert extract_links(html, "http://x.example/p") == [
        ("http://cdn.example/assets/img/a.html", "x")
    ]


def test_extract_links_nested_markup_in_anchor():
    from hbase_observer_es_spark.operators.html_text import extract_links

    html = '<a href="/y"><b>bold</b> and <i>more</i></a>'
    assert extract_links(html, "http://x.example/") == [
        ("http://x.example/y", "bold and more")
    ]


def test_extract_links_unclosed_anchor_at_eof():
    from hbase_observer_es_spark.operators.html_text import extract_links

    assert extract_links('<a href="/z">dangling text', "http://x.example/") == [
        ("http://x.example/z", "dangling text")
    ]


def test_nofollow_is_token_match_not_substring():
    from hbase_observer_es_spark.operators.html_text import extract_links

    html = (
        '<a href="/a" rel="nofollower">kept</a>'
        '<a href="/b" rel="sponsored nofollow">dropped</a>'
        '<a href="/c" rel="NOFOLLOW">dropped</a>'
    )
    assert [u for u, _ in extract_links(html, "http://x.example/")] == [
        "http://x.example/a"
    ]


def test_aliased_self_link_produces_no_self_loop(spark, tmp_path):
    """A page linking to a spec-equivalent spelling of ITSELF must not get
    a (u,u) edge — it would vote rank mass for itself every iteration."""
    from hbase_observer_es_spark.operators.html_text import warc_outlinks

    page = _http(
        b'<a href="http://s.example/dir/">self alias</a>'
        b'<a href="/other">real</a>'
    )
    shard = _record("response", page, uri="http://S.Example:80/dir/", rid="id:1")
    (tmp_path / "s.warc").write_bytes(shard)
    rows = warc_outlinks(read_warc(spark, str(tmp_path))).collect()
    assert [(r.src, r.dst) for r in rows] == [
        ("http://s.example/dir/", "http://s.example/other")
    ]


def test_warc_outlinks_canonicalizes_edge_keys(spark, tmp_path):
    """Spec-equivalent URL spellings (:80, dot-segments, escape case) must
    key to ONE node — otherwise rank mass splits across aliases."""
    from hbase_observer_es_spark.operators.html_text import warc_outlinks

    page = _http(
        b'<a href="HTTP://S.Example:80/a/../b%61ge">x</a>'
    )
    shard = _record("response", page, uri="http://S.Example:80/dir/", rid="id:1")
    (tmp_path / "c.warc").write_bytes(shard)
    rows = warc_outlinks(read_warc(spark, str(tmp_path))).collect()
    assert [(r.src, r.dst) for r in rows] == [
        ("http://s.example/dir/", "http://s.example/bage")
    ]


def test_warc_outlinks_to_pagerank_chain(spark, tmp_path):
    """The crawl-graph story composes: WARC shard → outlink edges →
    integer-exact PageRank over the REAL link graph. Page a is linked by
    both b and c (and links out), so it must outrank everything."""
    from hbase_observer_es_spark.operators.graph import pagerank_over_edges
    from hbase_observer_es_spark.operators.html_text import warc_outlinks

    def page(links: list[str]) -> bytes:
        body = "".join(f'<a href="{u}">l</a>' for u in links).encode()
        return _http(b"<html><body>" + body + b"</body></html>")

    shard = (
        _record("response", page(["http://s.example/b"]), uri="http://s.example/a", rid="id:1")
        + _record("response", page(["http://s.example/a"]), uri="http://s.example/b", rid="id:2")
        + _record("response", page(["http://s.example/a"]),
                  uri="http://s.example/c", rid="id:3")
    )
    (tmp_path / "g.warc").write_bytes(shard)
    edges = warc_outlinks(read_warc(spark, str(tmp_path)))
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == {
        ("http://s.example/a", "http://s.example/b"),
        ("http://s.example/b", "http://s.example/a"),
        ("http://s.example/c", "http://s.example/a"),
    }
    ranks = {r.node: r.rank_units for r in pagerank_over_edges(edges).collect()}
    assert set(ranks) == {"http://s.example/a", "http://s.example/b", "http://s.example/c"}
    # a has in-links from b AND c; c has none — strict ordering must hold
    assert ranks["http://s.example/a"] > ranks["http://s.example/b"] > ranks["http://s.example/c"]
    # rerun-determinism (bit-exact integers)
    again = {r.node: r.rank_units for r in pagerank_over_edges(edges).collect()}
    assert again == ranks


# ------------------------------------------------------- totality fuzz (never crash)

from hypothesis import given, settings
from hypothesis import strategies as st

_markupish = st.text(
    alphabet=st.sampled_from(list("<>&;/=\"' abpqstyle!-#x0123[]()\r\n\t\xa0é日💥")),
    max_size=80,
)


@given(html=_markupish)
@settings(max_examples=300, deadline=None)
def test_html_to_text_total_on_adversarial_markup(html):
    """Any string extracts to a string — malformed tags, half entities,
    stray angle brackets, truncations. Whitespace invariants always hold."""
    out = html_to_text(html)
    assert isinstance(out, str)
    assert "\xa0" not in out and "\t" not in out
    assert "  " not in "\n".join(l for l in out.split("\n"))
    assert not out.startswith("\n") and not out.endswith("\n")


@given(payload=st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_decode_http_html_total_on_adversarial_payloads(payload):
    out = decode_http_html(payload)
    assert out is None or isinstance(out, str)


@given(payload=st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_http_message_total_on_adversarial_payloads(payload):
    from hbase_observer_es_spark.sources.warc import http_message

    msg = http_message(b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + payload)
    assert msg is not None and isinstance(msg[1], bytes)


# ----------------------------------------------- registered query + its tether


def test_fixture_has_no_html_active_chars():
    """The q_html_extract oracle's closed form (source + ' & co' + blank line
    + text) is exact ONLY because the fixture corpus carries no HTML-active
    characters and no collapsible whitespace — verify that invariant, the
    multimodal ASCII-tether pattern. If the corpus generator ever changes,
    this fails before the oracle silently would."""
    import duckdb

    from .conftest import SF_ORACLE

    n = duckdb.sql(
        f"""
        SELECT count(*) FROM '{SF_ORACLE}/documents.parquet'
        WHERE text LIKE '%<%' OR text LIKE '%>%' OR text LIKE '%&%'
           OR text LIKE '%' || chr(10) || '%' OR text LIKE '%' || chr(9) || '%'
           OR text LIKE '%  %' OR text <> trim(text)
           OR source LIKE '%<%' OR source LIKE '%&%' OR source LIKE '%  %'
           OR source <> trim(source)
        """
    ).fetchone()[0]
    assert n == 0


def test_q_html_extract_matches_oracle(spark):
    from hbase_observer_es_spark.operators.html_text import (
        SQL_HTML_EXTRACT,
        q_html_extract,
    )

    from .conftest import SF_ORACLE
    from .oracle_harness import compare, duckdb_con

    r = compare(
        "q_html_extract",
        q_html_extract(spark, SF_ORACLE),
        duckdb_con(SF_ORACLE),
        SQL_HTML_EXTRACT,
    )
    assert r.ok, r.detail


def test_q_html_extract_is_map_only(spark):
    from hbase_observer_es_spark.operators.html_text import q_html_extract

    from .conftest import SF_ORACLE

    df = q_html_extract(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


# ------------------------------------------------------------------ Spark path


from .warc_fixtures import warc_record as _record  # noqa: E402


_PAGE = (
    b"<html><head><style>b{}</style></head><body>"
    b"<h1>Title</h1><p>Hello \xe6\x97\xa5\xe6\x9c\xac &amp; friends</p>"
    b"<script>skip()</script></body></html>"
)


def _shard() -> bytes:
    return (
        _record("warcinfo", b"software: test\r\n", rid="id:0")
        + _record("request", b"GET / HTTP/1.1\r\n", uri="http://x.example/a", rid="id:1")
        + _record("response", _http(_PAGE), uri="http://x.example/a", rid="id:2")
        + _record(
            "response",
            _http(b'{"json": true}', b"application/json"),
            uri="http://x.example/api",
            rid="id:3",
        )
        + _record(
            "response",
            _http(b"<p>second page</p>"),
            uri="http://x.example/b",
            rid="id:4",
        )
    )


def test_warc_to_documents_shape_and_content(spark, tmp_path):
    (tmp_path / "s.warc.gz").write_bytes(gzip.compress(_shard()))
    docs = warc_html_documents(read_warc(spark, str(tmp_path)))
    assert [f.name for f in docs.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    rows = {r.source: r for r in docs.collect()}
    # JSON response and non-response records are dropped; 2 HTML pages land
    assert set(rows) == {"http://x.example/a", "http://x.example/b"}
    a = rows["http://x.example/a"]
    assert a.text == "Title\n\nHello 日本 & friends"
    assert a.lang is None and a.n_chars == len(a.text)
    b = rows["http://x.example/b"]
    assert b.text == "second page"


def test_doc_ids_deterministic_across_reruns(spark, tmp_path):
    (tmp_path / "s.warc.gz").write_bytes(gzip.compress(_shard()))
    ids1 = sorted(r.doc_id for r in warc_html_documents(read_warc(spark, str(tmp_path))).collect())
    ids2 = sorted(r.doc_id for r in warc_html_documents(read_warc(spark, str(tmp_path))).collect())
    assert ids1 == ids2 and len(set(ids1)) == 2


def test_extraction_is_map_only(spark, tmp_path):
    """Filter + one Arrow-batched UDF over the WARC frame — no shuffle, no
    join: extraction adds zero data movement to the one-task-per-shard scan."""
    (tmp_path / "s.warc").write_bytes(_shard())
    docs = warc_html_documents(read_warc(spark, str(tmp_path)))
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_truncated_page_in_valid_container_still_lands(spark, tmp_path):
    """A response whose HTML is cut mid-tag extracts best-effort — record-
    level tolerance, container-level strictness."""
    shard = _record(
        "response", _http(b"<p>kept text<div", b"text/html"),
        uri="http://x.example/cut", rid="id:9",
    )
    (tmp_path / "t.warc").write_bytes(shard)
    rows = warc_html_documents(read_warc(spark, str(tmp_path))).collect()
    assert [r.text for r in rows] == ["kept text"]
