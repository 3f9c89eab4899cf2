"""DOCX/ODT/EPUB extraction over hand-built real ZIP archives."""

from __future__ import annotations

import io
import zipfile

import pytest

from hbase_observer_es_spark.operators.office_text import (
    docx_to_text,
    epub_to_text,
    odt_to_text,
    office_parts,
    office_to_text,
    sniff_office,
)

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_T = 'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'


def _zip(members: dict, mimetype: bytes | None = None) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        if mimetype is not None:
            # the EPUB/ODT convention: first member, stored uncompressed
            zf.writestr(
                zipfile.ZipInfo("mimetype"), mimetype,
                compress_type=zipfile.ZIP_STORED,
            )
        for name, content in members.items():
            zf.writestr(name, content)
    return buf.getvalue()


def _docx(body_xml: str) -> bytes:
    doc = f'<?xml version="1.0"?><w:document {_W}><w:body>{body_xml}</w:body></w:document>'
    return _zip({
        "[Content_Types].xml": "<Types/>",
        "word/document.xml": doc,
    })


def _para(*runs: str) -> str:
    return "<w:p>" + "".join(f"<w:r><w:t>{r}</w:t></w:r>" for r in runs) + "</w:p>"


def _odt(body_xml: str) -> bytes:
    doc = (
        f'<?xml version="1.0"?><office:document-content '
        f'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" {_T}>'
        f"<office:body><office:text>{body_xml}</office:text></office:body>"
        "</office:document-content>"
    )
    return _zip(
        {"content.xml": doc},
        mimetype=b"application/vnd.oasis.opendocument.text",
    )


def _epub(chapters: dict, spine: list) -> bytes:
    container = (
        '<?xml version="1.0"?><container '
        'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    )
    manifest = "".join(
        f'<item id="c{i}" href="{name}" media-type="application/xhtml+xml"/>'
        for i, name in enumerate(chapters)
    )
    order = {name: f"c{i}" for i, name in enumerate(chapters)}
    spine_xml = "".join(f'<itemref idref="{order[n]}"/>' for n in spine)
    opf = (
        '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf">'
        f"<manifest>{manifest}</manifest><spine>{spine_xml}</spine></package>"
    )
    members = {"META-INF/container.xml": container, "OEBPS/content.opf": opf}
    for name, html in chapters.items():
        members[f"OEBPS/{name}"] = html
    return _zip(members, mimetype=b"application/epub+zip")


def test_docx_paragraphs_runs_tabs_breaks():
    body = (
        _para("Hello ", "world.")
        + "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
    )
    data = _docx(body)
    assert sniff_office(data) == "docx"
    assert docx_to_text(data) == "Hello world.\na b\nc"
    assert office_parts(data) == 2


def test_docx_table_cells_flow_in_document_order():
    body = (
        _para("before")
        + "<w:tbl><w:tr><w:tc>" + _para("cell one") + "</w:tc>"
        + "<w:tc>" + _para("cell two") + "</w:tc></w:tr></w:tbl>"
        + _para("after")
    )
    assert docx_to_text(_docx(body)) == "before\ncell one\ncell two\nafter"


def test_odt_paragraph_semantics():
    body = (
        "<text:h>Title</text:h>"
        "<text:p>a<text:tab/>b<text:line-break/>c</text:p>"
        '<text:p>x<text:s text:c="3"/>y <text:span>nested '
        "<text:span>deep</text:span></text:span> tail</text:p>"
    )
    data = _odt(body)
    assert sniff_office(data) == "odt"
    assert odt_to_text(data) == "Title\na b\nc\nx y nested deep tail"
    assert office_parts(data) == 3


def test_epub_spine_order_not_manifest_order():
    chapters = {
        "one.xhtml": "<html><body><h1>Alpha</h1><p>First chapter.</p></body></html>",
        "two.xhtml": "<html><body><p>Second &amp; final.</p></body></html>",
    }
    data = _epub(chapters, spine=["two.xhtml", "one.xhtml"])  # reversed!
    assert sniff_office(data) == "epub"
    got = epub_to_text(data)
    assert got.index("Second & final.") < got.index("Alpha")
    assert office_parts(data) == 2


def test_office_to_text_dispatch_and_refusals():
    kind, text = office_to_text(_docx(_para("x")))
    assert (kind, text) == ("docx", "x")
    plain = _zip({"data.txt": "not office"})
    assert sniff_office(plain) is None
    with pytest.raises(ValueError, match=r"none of DOCX/ODT/EPUB"):
        office_to_text(plain)
    with pytest.raises(ValueError, match=r"DOCTYPE"):
        docx_to_text(_zip({
            "word/document.xml":
                f'<?xml version="1.0"?><!DOCTYPE x [<!ENTITY a "b">]>'
                f"<w:document {_W}><w:body/></w:document>",
        }))
    with pytest.raises(ValueError, match=r"not well-formed"):
        docx_to_text(_zip({"word/document.xml": "<w:document"}))
    # spine naming a missing manifest item / missing member
    bad = _epub({"one.xhtml": "<p>x</p>"}, spine=["one.xhtml"])
    broken = bad.replace(b"OEBPS/one.xhtml", b"OEBPS/gone.xhtml", 1)
    with pytest.raises(ValueError):
        epub_to_text(broken)


def test_census_routes_office_and_archives():
    from hbase_observer_es_spark.operators.media_census import classify_media

    r = classify_media(_docx(_para("a") + _para("b")))
    assert (r["family"], r["format"], r["n_frames"]) == ("document", "docx", 2)
    r = classify_media(_epub({"c.xhtml": "<p>z</p>"}, ["c.xhtml"]))
    assert (r["family"], r["format"], r["n_frames"]) == ("document", "epub", 1)
    r = classify_media(_zip({"a.txt": "x", "b/c.bin": "y"}))
    assert (r["family"], r["format"], r["n_frames"]) == ("archive", "zip", 2)
    # a corrupt PK payload folds into an error row, never a crash
    r = classify_media(b"PK\x03\x04garbage")
    assert r["family"] in ("archive", "error")


def test_office_text_frame(spark):
    from hbase_observer_es_spark.operators.office_text import office_text_frame

    df = spark.createDataFrame(
        [
            (1, _docx(_para("spark docx"))),
            (2, _odt("<text:p>spark odt</text:p>")),
            (3, _epub({"a.xhtml": "<p>spark epub</p>"}, ["a.xhtml"])),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: (r.kind, r.text) for r in office_text_frame(df).collect()}
    assert rows == {
        1: ("docx", "spark docx"),
        2: ("odt", "spark odt"),
        3: ("epub", "spark epub"),
    }


def test_review_findings_census_safety_and_guards():
    """Second-pass review regressions: zero-byte signature members,
    full-document + UTF-16 DOCTYPE scan, bounded text:s, percent-encoded
    EPUB hrefs, text-box dedup, bomb-sized mimetype."""
    from hbase_observer_es_spark.operators.media_census import classify_media

    # zero-byte word/document.xml: ValueError (census-foldable), no KeyError
    z = _zip({"word/document.xml": b""})
    with pytest.raises(ValueError, match=r"not well-formed"):
        docx_to_text(z)
    assert classify_media(z)["family"] == "error"
    # DOCTYPE beyond 4 KiB of prolog comment still refuses
    pad = "<!-- " + "x" * 5000 + " -->"
    doc = (f'<?xml version="1.0"?>{pad}<!DOCTYPE r [<!ENTITY a "b">]>'
           f"<w:document {_W}><w:body/></w:document>")
    with pytest.raises(ValueError, match=r"DOCTYPE"):
        docx_to_text(_zip({"word/document.xml": doc}))
    # UTF-16 spelling refuses too
    doc16 = ('<?xml version="1.0" encoding="utf-16"?><!DOCTYPE r [<!ENTITY '
             f'a "b">]><w:document {_W}><w:body/></w:document>'
             ).encode("utf-16-le")
    with pytest.raises(ValueError, match=r"DOCTYPE"):
        docx_to_text(_zip({"word/document.xml": doc16}))
    # text:s run length is attacker data: bounded and integer-validated
    with pytest.raises(ValueError, match=r"outside 0\.\."):
        odt_to_text(_odt('<text:p><text:s text:c="999999999"/></text:p>'))
    with pytest.raises(ValueError, match=r"not an integer"):
        odt_to_text(_odt('<text:p><text:s text:c="zz"/></text:p>'))


def test_epub_percent_encoded_hrefs_resolve():
    chapters = {"my ch.xhtml": "<p>spaced name</p>"}
    data = _epub(chapters, spine=["my ch.xhtml"])
    # the OPF must reference the member through its IRI form
    data = data.replace(b'href="my ch.xhtml"', b'href="my%20ch.xhtml"')
    assert epub_to_text(data) == "spaced name"


def test_docx_textbox_extracts_once():
    body = (
        "<w:p><w:r><w:t>outer </w:t>"
        "<w:pict><w:txbxContent>" + _para("boxed") + "</w:txbxContent></w:pict>"
        "</w:r></w:p>"
    )
    data = _docx(body)
    assert docx_to_text(data) == "outer boxed"
    assert office_parts(data) == 1  # the nested w:p is not its own part


def test_oversized_mimetype_is_not_an_office_signature():
    big = _zip({"word/document.xml": "<x/>"}, mimetype=b"A" * 4096)
    # mimetype > 1 KiB: not a plausible signature; sniff refuses to read it
    assert sniff_office(big) is None


def test_odt_nesting_depth_guard():
    """ADVICE r12: thousands of nested text:span elements must raise the
    loud ValueError, not RecursionError (pdf_text.py lexer discipline)."""
    deep = "<text:p>" + "<text:span>" * 2000 + "x" + "</text:span>" * 2000 + "</text:p>"
    with pytest.raises(ValueError, match=r"nesting exceeds 128 levels"):
        odt_to_text(_odt(deep))
    # 100 levels is legitimate nesting and still extracts
    ok = "<text:p>" + "<text:span>" * 100 + "deep" + "</text:span>" * 100 + "</text:p>"
    assert odt_to_text(_odt(ok)) == "deep"
