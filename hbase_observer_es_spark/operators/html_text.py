"""HTML→text extraction over WARC payloads — the missing link between the
archival crawl-ingest source (``sources/warc.py``) and the corpus pipeline
(quality → dedup → pack → publish).

A Common Crawl user's single most common step is turning a ``response``
record's HTML body into a ``documents``-shaped text row. This module does it
with NO external library: the tokenizer is the stdlib ``html.parser``
(WHATWG-HTML-derived, tolerant of truncation and malformed markup — exactly
what crawl payloads are), entity decoding is the stdlib named/numeric
charref table, and charset handling reads the HTTP ``Content-Type`` header
the WARC payload itself carries.

Extraction semantics (deterministic, documented, golden-tested):

* ``script`` / ``style`` / ``noscript`` / ``template`` / ``svg`` / ``iframe``
  / ``object`` / ``embed`` / ``applet`` subtrees and ``title`` text emit
  NOTHING — markup, styling, and metadata are boilerplate, not text. (Title
  is tracked by its own rule rather than skipping ``head``: both of head's
  tags are omissible per the HTML spec, so element-depth tracking on head
  drops whole documents on spec-valid pages; meta/link/base carry no text
  anyway.) Comments, CDATA sections, doctypes, and processing instructions
  likewise.
* Block-level boundaries (``p``, ``div``, headings, list items, table rows,
  ``br``, ``pre``, …) become newlines; table cells become single spaces; all
  other tags vanish inline (``<b>bold</b> text`` → ``bold text``).
* Character references decode exactly once (``&amp;lt;`` → ``&lt;``), NBSP
  normalizes to a plain space.
* Whitespace: runs of spaces/tabs collapse to one space per line, ≥2 blank
  lines collapse to one paragraph break, edges strip.
* Truncated HTML (a shard cut mid-tag) yields the text up to the cut —
  extraction is per-record best-effort, unlike the WARC STRUCTURE checks
  which stay fail-loud (a broken container kills the job; a sloppy page,
  which is most pages, does not).

Publisher opt-out: pages carrying ``<meta name=robots … noindex …>`` are
dropped at extraction (``is_noindexed``) — honoring the machine-readable
reuse signal is the Common Crawl norm and belongs at ingest, before the
page can enter dedup/packing.

Scale posture: ``warc_html_documents`` is MAP-ONLY — a filter plus one
Arrow-batched pandas UDF over the payload column, no shuffle, no collect.
At 100 TB the parallelism is the WARC source's one-task-per-shard contract;
extraction adds zero data movement, and the output flows straight into the
corpus operators (``q_text_langid`` fills ``lang``; extraction does not
guess). ``doc_id`` is ``xxhash64(target_uri, record_id)`` — deterministic
across reruns, collision-safe at corpus scale (64-bit over <2^32 docs).

Reference parity note: the reference engine (HbaseDataSyncEsObserver.java)
has no crawl ingest at all — this module exists for the LLM-data-pipeline
surface the build brief makes first-class, not for A1–A14 parity.
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser


class _TotalParser(HTMLParser):
    """HTMLParser that is TOTAL on adversarial markup: the stdlib
    ``_markupbase`` raises a bare AssertionError on a malformed marked
    section like ``<![0`` (hypothesis-found). WHATWG treats such input
    as a bogus comment — skip to the closing ``>`` (emitting nothing)
    or, unterminated, leave it buffered for the eof-in-tag drop the
    callers already do."""

    def parse_marked_section(self, i, report=1):
        try:
            return super().parse_marked_section(i, report)
        except AssertionError:
            j = self.rawdata.find(">", i)
            return -1 if j < 0 else j + 1

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Subtrees that emit no text at all (boilerplate/markup payloads). NOTE:
# "head" is deliberately NOT here — the HTML spec makes both of head's tags
# omissible (<body> implies </head>; <title> before <head> implies <head>),
# so depth-tracking the head element drops whole documents on spec-valid
# pages (round-10 review finding, confirmed on '<head>…<body>…' with no
# </head>). The only head child that CARRIES text is <title>, which is
# skipped by its own rule below; the rest (meta/link/base) emit no data.
_SKIP = frozenset(
    "script style noscript template svg iframe object embed applet".split()
)
# tags allowed inside head: a <title> skip ends implicitly when any tag
# OUTSIDE this set starts (the WHATWG implied-end rule) — an unclosed
# <title> must not swallow the document body
_HEADISH = frozenset(
    "title meta link base style script noscript template head html".split()
)
# tags that break the text flow into lines/paragraphs
_BLOCK = frozenset(
    (
        "p div br hr li ul ol dl dt dd table thead tbody tfoot tr caption "
        "h1 h2 h3 h4 h5 h6 blockquote pre section article header footer "
        "aside nav main address figure figcaption form fieldset details "
        "summary option optgroup"
    ).split()
)
# cell separators inside a row (space, not newline)
_CELL = frozenset("td th".split())
# void block tags: <br/> fires start+end events — the end emits nothing, or
# a self-closed break would double into a paragraph
_VOID = frozenset("br hr".split())


class _TextExtractor(_TotalParser):
    """Tolerant tag-strip tokenizer: stdlib html.parser drives tag/data/
    charref events; we keep data outside skip subtrees and inject the
    block/cell separators."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._parts: list[str] = []
        self._skip_depth = 0
        self._pre_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if self._in_title and tag not in _HEADISH:
            self._in_title = False  # implied </title> (WHATWG)
        if tag == "title":
            self._in_title = True
        elif tag in _SKIP:
            self._skip_depth += 1
        elif tag in _BLOCK:
            if tag == "pre":
                self._pre_depth += 1
            self._parts.append("\n")
        elif tag in _CELL:
            self._parts.append(" ")

    def handle_endtag(self, tag):
        if tag in ("title", "head"):  # a title cannot span past </head>
            self._in_title = False
            if tag == "title":
                return
        if tag in _VOID:
            return
        if tag in _SKIP:
            # tolerate malformed nesting: never go negative
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK:
            if tag == "pre":
                self._pre_depth = max(0, self._pre_depth - 1)
            self._parts.append("\n")
        elif tag in _CELL:
            self._parts.append(" ")

    def handle_data(self, data):
        if not self._skip_depth and not self._in_title and data:
            if not self._pre_depth:
                # source newlines are HTML whitespace, not line breaks —
                # only TAG boundaries break lines (except inside <pre>)
                data = _SRC_NL.sub(" ", data)
            self._parts.append(data)

    def text(self) -> str:
        return "".join(self._parts)


_SRC_NL = re.compile(r"[\r\n]+")
_WS_RUN = re.compile(r"[ \t\xa0]+")
_NL_RUN = re.compile(r"\n{3,}")


def html_to_text(html: str) -> str:
    """Extract readable text from one HTML string (module docstring has the
    exact semantics). Pure, deterministic, library-free."""
    p = _TextExtractor()
    p.feed(html)
    # close() flushes any buffered incomplete markup as DATA; a trailing
    # "<b" fragment from a mid-tag truncation is markup, not text — drop it
    # (matches the WHATWG eof-in-tag rule: the partial tag emits nothing)
    if p.rawdata.startswith("<"):
        p.rawdata = ""
    p.close()
    raw = p.text()
    lines = [_WS_RUN.sub(" ", ln).strip() for ln in raw.split("\n")]
    return _NL_RUN.sub("\n\n", "\n".join(lines)).strip("\n ")


_CHARSET = re.compile(r"charset=[\"']?([A-Za-z0-9_\-]+)", re.IGNORECASE)
# <meta charset="..."> or <meta http-equiv=... content="...; charset=...">
_META_CHARSET = re.compile(rb"<meta[^>]{0,200}?charset=[\"']?([A-Za-z0-9_\-]+)", re.IGNORECASE)


def _known_codec(name: str) -> str | None:
    try:
        codecs.lookup(name)
        return name
    except LookupError:
        return None


def decode_http_html(payload: bytes) -> str | None:
    """Decode a ``response`` record's payload to an HTML string, or None if
    the HTTP message does not declare an HTML content type or its body
    cannot be decoded.

    The HTTP envelope goes through ``sources.warc.http_message``, which
    removes chunked transfer framing and gzip/deflate content compression —
    the codings crawled HTTP actually carries — before this function sees
    the body. A body that is STILL coded afterwards (e.g. brotli, no lib)
    returns None rather than extracting compression noise as "text".

    Charset, in precedence order (the WHATWG sniffing ladder's
    deterministic subset): the ``Content-Type`` header's ``charset=``
    parameter, else a ``<meta charset=…>`` / ``<meta http-equiv
    content="…charset=…">`` declaration within the first 1024 body bytes
    (where the HTML standard requires it to appear), else UTF-8 — skipping
    any name Python has no codec for; decoding is errors="replace" either
    way (crawl bodies routinely lie about their encoding — replacement is
    deterministic, a decode crash on page 4 billion is not a policy)."""
    from ..sources.warc import http_message

    msg = http_message(payload)
    if msg is None:
        # no HTTP envelope (e.g. a WARC `conversion` record): the whole
        # payload is the document — same charset sniffing as the body path
        return _sniff_decode(payload, None)
    headers, body = msg
    ctype = headers.get("content-type")
    if ctype is not None and "html" not in ctype.lower():
        return None
    if ctype is None and not _looks_like_html(body):
        # no declared type: accept only a recognizable HTML signature —
        # a misconfigured server's image/PDF must not land as U+FFFD soup
        return None
    if "content-encoding" in headers or "transfer-encoding" in headers:
        return None  # still-coded body (undecodable or corrupt layer)
    return _sniff_decode(body, ctype)


_HTML_SIGNATURE = re.compile(
    rb"<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>]", re.IGNORECASE
)


def _looks_like_html(body: bytes) -> bool:
    """WHATWG-sniffing-spirit signature check over the document prefix."""
    return _HTML_SIGNATURE.search(body[:1024]) is not None


def _sniff_decode(body: bytes, ctype: str | None) -> str:
    """Charset ladder (module docstring): header param → meta tag in the
    first 1024 bytes → UTF-8; errors="replace" throughout."""
    charset = None
    m = _CHARSET.search(ctype or "")
    if m:
        charset = _known_codec(m.group(1))
    if charset is None:
        m = _META_CHARSET.search(body[:1024])
        if m:
            charset = _known_codec(m.group(1).decode("ascii", errors="replace"))
    return body.decode(charset or "utf-8", errors="replace")


# a <meta> tag that names robots AND carries a noindex directive — both
# attribute orders, any quoting; matched per-tag so "noindex" in body text
# or a robots meta WITHOUT the directive never trips it
_META_TAG = re.compile(r"<meta[^>]{0,500}?>", re.IGNORECASE)
_ROBOTS_NAME = re.compile(r"name\s*=\s*[\"']?robots\b", re.IGNORECASE)
_NOINDEX = re.compile(r"\bnoindex\b", re.IGNORECASE)


def is_noindexed(html: str) -> bool:
    """True when the page carries ``<meta name=robots … noindex …>`` — the
    publisher's machine-readable opt-out of indexing/reuse. A corpus
    pipeline honors it at ingest (the Common Crawl norm), so
    ``warc_html_documents`` drops such pages before they enter the chain."""
    for m in _META_TAG.finditer(html):
        tag = m.group(0)
        if _ROBOTS_NAME.search(tag) and _NOINDEX.search(tag):
            return True
    return False


def extract_text_udf(payload: Column) -> Column:
    """Arrow-batched pandas UDF: WARC payload bytes → extracted text (NULL
    for non-HTML responses and for pages opting out via robots noindex)."""

    @F.pandas_udf(T.StringType())
    def _extract(s):
        import pandas as pd

        def one(b):
            if b is None:
                return None
            html = decode_http_html(bytes(b))
            if html is None or is_noindexed(html):
                return None
            return html_to_text(html)

        return pd.Series([one(b) for b in s])

    return _extract(payload)


def html_text_column(html: Column) -> Column:
    """Arrow-batched pandas UDF: HTML string → extracted text (NULL in,
    NULL out)."""

    @F.pandas_udf(T.StringType())
    def _extract(s):
        return s.map(lambda h: None if h is None else html_to_text(h))

    return _extract(html)


def q_html_extract(spark, sf_dir: str) -> DataFrame:
    """HTML→text extraction as a registered, oracle-checked query: synthesize
    a page around each document IN SPARK (head/style/script boilerplate, an
    ``&amp;`` entity, block structure), extract with the full tokenizer
    pipeline, and emit the text plus its length.

    Oracle tether: the extractor's output on this template is
    ``source + " & co" + blank line + text`` EXACTLY, because the fixture
    corpus contains no HTML-active characters and no collapsible whitespace
    (verified at every SF: 0 docs with ``&``/``<``/``>``, tabs, newlines,
    double spaces, or untrimmed edges — pinned by
    ``tests/test_html_text.py::test_fixture_has_no_html_active_chars``, the
    multimodal ASCII-tether pattern). The DuckDB oracle mirrors that closed
    form; the adversarial-markup behavior is pinned separately by the golden
    tests, which need no oracle.

    Scale: map-only — one scan, one Arrow-batched UDF, no shuffle."""
    from ..io import table

    d = table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit(
            "<html><head><title>t</title><style>p{color:red}</style></head>"
            "<body><h1>"
        ),
        F.col("source"),
        F.lit(" &amp; co</h1><p>"),
        F.col("text"),
        F.lit("</p><script>var x=1;</script></body></html>"),
    )
    return d.select(
        "doc_id",
        html_text_column(page).alias("extracted"),
    ).withColumn("n_extract", F.length("extracted"))


SQL_HTML_EXTRACT = """
SELECT doc_id,
       source || ' & co' || chr(10) || chr(10) || text AS extracted,
       CAST(length(source || ' & co' || chr(10) || chr(10) || text) AS BIGINT)
           AS n_extract
FROM documents
"""

QUERIES = {"q_html_extract": q_html_extract}
ORACLES = {"q_html_extract": SQL_HTML_EXTRACT}


class _LinkExtractor(_TotalParser):
    """Collect (href, anchor text) from ``<a>`` tags plus the ``<base
    href>`` override; rel=nofollow links are skipped (the publisher's
    per-link opt-out, same standing as the robots meta)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.base: str | None = None
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._anchor: list[str] = []

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "base" and self.base is None and d.get("href"):
            self.base = d["href"]
        elif tag == "a":
            self._flush()
            href = d.get("href")
            # rel is a SPACE-SEPARATED token list — substring containment
            # would also drop rel="nofollower"/vendor tokens (review find)
            rel_tokens = (d.get("rel") or "").lower().split()
            if href and "nofollow" not in rel_tokens:
                self._href = href

    def handle_endtag(self, tag):
        if tag == "a":
            self._flush()

    def handle_data(self, data):
        if self._href is not None:
            self._anchor.append(data)

    def _flush(self) -> None:
        if self._href is not None:
            self.links.append(
                (self._href, _WS_RUN.sub(" ", "".join(self._anchor)).strip())
            )
        self._href = None
        self._anchor = []


def extract_links(html: str, page_url: str) -> list[tuple[str, str]]:
    """(absolute url, anchor text) for every followable ``<a href>``:
    resolved against ``<base href>`` (falling back to the page URL),
    fragments stripped, non-navigational schemes (javascript/mailto/tel/
    data) and empty fragment-only self-links dropped. Pure, deterministic,
    stdlib ``urljoin`` only."""
    from urllib.parse import urldefrag, urljoin

    p = _LinkExtractor()
    p.feed(html)
    if p.rawdata.startswith("<"):
        p.rawdata = ""
    p.close()
    p._flush()
    base = urljoin(page_url, p.base) if p.base else page_url
    out = []
    for href, anchor in p.links:
        href = href.strip()
        scheme = href.split(":", 1)[0].lower() if ":" in href.split("/", 1)[0] else ""
        if scheme in ("javascript", "mailto", "tel", "data"):
            continue
        absolute = urldefrag(urljoin(base, href))[0]
        if absolute and absolute != urldefrag(page_url)[0]:
            out.append((absolute, anchor))
    return out


OUTLINK_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("dst", T.StringType()),
        T.StructField("anchor", T.StringType()),
    ]
)


def warc_outlinks(warc_df: DataFrame) -> DataFrame:
    """``response`` records → the crawl LINK GRAPH as (src, dst, anchor)
    edges — the input ``graph.pagerank_over_edges`` ranks. 1→N fan-out via
    ``mapInPandas`` (row count changes inside the UDF), map-only like the
    text extraction; noindexed pages contribute no edges. Both endpoints
    are RFC-3986-canonicalized (``operators/urlnorm.py``) so that
    spec-equivalent spellings (:80, dot-segments, escape case) key to ONE
    graph node instead of splitting rank mass."""
    from .urlnorm import canonical_url

    src_df = warc_df.filter(F.col("warc_type") == "response").select(
        "target_uri", "payload"
    )

    def expand(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for uri, payload in zip(pdf["target_uri"], pdf["payload"]):
                if uri is None or payload is None:
                    continue
                html = decode_http_html(bytes(payload))
                if html is None or is_noindexed(html):
                    continue
                src = canonical_url(uri)
                for dst, anchor in extract_links(html, uri):
                    dst_c = canonical_url(dst)
                    if dst_c == src:
                        # self-loop after canonicalization (an aliased
                        # spelling of the page itself): a (u,u) edge would
                        # let the page vote 17/20 of an out-share for its
                        # own rank every iteration
                        continue
                    rows.append({"src": src, "dst": dst_c, "anchor": anchor})
            yield pd.DataFrame(rows, columns=["src", "dst", "anchor"])

    return src_df.mapInPandas(expand, schema=OUTLINK_SCHEMA)


def warc_html_documents(warc_df: DataFrame) -> DataFrame:
    """``response`` records → ``documents``-shaped rows (doc_id, text, lang,
    source, n_chars). Map-only; ``lang`` is NULL by design — language ID is
    ``q_text_langid``'s job downstream, extraction does not guess."""
    return (
        warc_df.filter(F.col("warc_type") == "response")
        .select(
            F.xxhash64("target_uri", "record_id").alias("doc_id"),
            extract_text_udf(F.col("payload")).alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.col("target_uri").alias("source"),
        )
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .withColumn("n_chars", F.length("text"))
    )
