"""DOCX / ODT / EPUB text extraction — the office-document corpus leg.

Word-processor documents and ebooks are large, high-quality text sources,
and all three formats are public: ZIP containers (walked by the
CRC-verified, bomb-guarded member iterator in ``sources/zipsrc.py``)
around published XML vocabularies —

* **DOCX** (ECMA-376 WordprocessingML): ``word/document.xml``, paragraphs
  ``w:p`` with runs ``w:r``/``w:t``, explicit ``w:tab``/``w:br``; tables
  flow in document order so their cell paragraphs extract naturally;
* **ODT** (OASIS OpenDocument): ``content.xml``, paragraphs ``text:p``
  and headings ``text:h`` with ``text:span`` nesting, ``text:tab``,
  ``text:line-break``, and the run-length space element ``text:s``;
* **EPUB** (IDPF OCF/OPF): ``META-INF/container.xml`` → the OPF package,
  manifest hrefs + SPINE reading order, each XHTML chapter through the
  repo's own library-free ``html_text.html_to_text`` (which already owns
  entity/whitespace handling — XHTML's external-DTD entities make a
  strict XML parse the wrong tool there).

XML is parsed with stdlib ``xml.etree`` AFTER a loud DOCTYPE refusal —
none of these vocabularies uses one, and internal-entity declarations are
the billion-laughs vector, so a document carrying ``<!DOCTYPE`` is
treated as attacker data rather than expanded. ZIP-level hazards
(encrypted members, declared-size lies, decompression bombs) are already
refused by the shared member iterator.

``sniff_office`` classifies a ZIP payload by its members (EPUB's
``mimetype``, DOCX's ``word/document.xml``, ODT's OpenDocument
mimetype); the media census routes ``PK`` payloads through it — office
documents survey as family="document" with their part counts, other
archives as family="archive" with member counts.

Reference parity: none — builder-brief document-pipeline surface
(SURVEY §2-D), beside ``pdf_text.py``/``html_text.py``/
``markdown_text.py``.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile

ZIP_MAGIC = b"PK\x03\x04"

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_TEXT_NS = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_CONTAINER_NS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF_NS = "{http://www.idpf.org/2007/opf}"


def looks_like_zip(payload: bytes) -> bool:
    return payload[: len(ZIP_MAGIC)] == ZIP_MAGIC


def _members(payload: bytes, origin: str) -> dict:
    """All members via the shared CRC-verified, bomb-guarded walk."""
    from ..sources.zipsrc import _iter_members

    return dict(_iter_members(payload, origin, None))


def sniff_office(payload: bytes, origin: str = "<bytes>") -> str | None:
    """'docx' | 'odt' | 'epub' | None for a ZIP payload, from the member
    directory only (no body parse). The EPUB/ODT ``mimetype`` member is
    authoritative when present; DOCX is identified by its fixed document
    part name."""
    if not looks_like_zip(payload):
        return None
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile:
        return None
    with zf:
        names = set(zf.namelist())
        mimetype = b""
        if "mimetype" in names:
            try:
                mimetype = zf.read("mimetype").strip()
            except Exception:
                return None
        if mimetype == b"application/epub+zip" or (
            not mimetype and "META-INF/container.xml" in names
        ):
            return "epub"
        if mimetype.startswith(b"application/vnd.oasis.opendocument.text"):
            return "odt"
        if "word/document.xml" in names:
            return "docx"
    return None


def _parse_xml(data: bytes, origin: str, what: str):
    """stdlib etree behind the DOCTYPE refusal (entity-expansion guard:
    none of the office vocabularies declares one)."""
    import xml.etree.ElementTree as ET

    if b"<!DOCTYPE" in data[:4096]:
        raise ValueError(
            f"office {origin}: {what} carries a DOCTYPE declaration — "
            "refusing (internal entities are the expansion vector; the "
            "office XML vocabularies never use one)"
        )
    try:
        return ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(
            f"office {origin}: {what} is not well-formed XML ({exc})"
        ) from None


# ------------------------------------------------------------------- docx


def _docx_paragraph(p) -> str:
    """One w:p in document order: w:t text, w:tab → tab, w:br → newline."""
    parts: list = []
    for node in p.iter():
        tag = node.tag
        if tag == _W_NS + "t":
            parts.append(node.text or "")
        elif tag == _W_NS + "tab":
            parts.append("\t")
        elif tag in (_W_NS + "br", _W_NS + "cr"):
            parts.append("\n")
    return "".join(parts)


def docx_to_text(payload: bytes, origin: str = "<bytes>") -> str:
    """word/document.xml → text, one line per paragraph (tables flow in
    document order — their cell paragraphs are w:p like any other)."""
    members = _members(payload, origin)
    doc = members.get("word/document.xml")
    if doc is None:
        raise ValueError(
            f"office {origin}: no word/document.xml member — not a DOCX"
        )
    root = _parse_xml(doc, origin, "word/document.xml")
    paras = [_docx_paragraph(p) for p in root.iter(_W_NS + "p")]
    return _normalize("\n".join(paras))


# -------------------------------------------------------------------- odt


def _odt_text(node) -> str:
    """Recursive ODF text: spans nest, text:tab/line-break/s are
    elements (text:s carries a run length in @text:c, default 1)."""
    parts: list = [node.text or ""]
    for child in node:
        tag = child.tag
        if tag == _TEXT_NS + "tab":
            parts.append("\t")
        elif tag == _TEXT_NS + "line-break":
            parts.append("\n")
        elif tag == _TEXT_NS + "s":
            parts.append(" " * int(child.get(_TEXT_NS + "c", "1")))
        else:
            parts.append(_odt_text(child))
        parts.append(child.tail or "")
    return "".join(parts)


def odt_to_text(payload: bytes, origin: str = "<bytes>") -> str:
    members = _members(payload, origin)
    doc = members.get("content.xml")
    if doc is None:
        raise ValueError(
            f"office {origin}: no content.xml member — not an ODT"
        )
    root = _parse_xml(doc, origin, "content.xml")
    paras = []
    for node in root.iter():
        if node.tag in (_TEXT_NS + "p", _TEXT_NS + "h"):
            paras.append(_odt_text(node))
    return _normalize("\n".join(paras))


# ------------------------------------------------------------------- epub


def epub_to_text(payload: bytes, origin: str = "<bytes>") -> str:
    """container.xml → OPF → spine order → each XHTML chapter through
    html_to_text; chapters joined with blank lines."""
    from .html_text import html_to_text

    members = _members(payload, origin)
    container = members.get("META-INF/container.xml")
    if container is None:
        raise ValueError(
            f"office {origin}: no META-INF/container.xml — not an EPUB"
        )
    croot = _parse_xml(container, origin, "container.xml")
    rootfile = croot.find(
        f"{_CONTAINER_NS}rootfiles/{_CONTAINER_NS}rootfile"
    )
    if rootfile is None or not rootfile.get("full-path"):
        raise ValueError(
            f"office {origin}: container.xml names no rootfile"
        )
    opf_path = rootfile.get("full-path")
    opf = members.get(opf_path)
    if opf is None:
        raise ValueError(
            f"office {origin}: rootfile {opf_path!r} missing from the "
            "archive"
        )
    oroot = _parse_xml(opf, origin, opf_path)
    base = posixpath.dirname(opf_path)
    hrefs = {}
    for item in oroot.iter(_OPF_NS + "item"):
        iid, href = item.get("id"), item.get("href")
        if iid and href:
            hrefs[iid] = posixpath.normpath(
                posixpath.join(base, href) if base else href
            )
    chapters = []
    for itemref in oroot.iter(_OPF_NS + "itemref"):
        idref = itemref.get("idref")
        path = hrefs.get(idref)
        if path is None:
            raise ValueError(
                f"office {origin}: spine idref {idref!r} has no manifest "
                "item"
            )
        body = members.get(path)
        if body is None:
            raise ValueError(
                f"office {origin}: spine item {path!r} missing from the "
                "archive"
            )
        # EPUB's default encoding is UTF-8; XHTML goes through the
        # library-free HTML extractor (it owns entities + whitespace)
        chapters.append(html_to_text(body.decode("utf-8", "replace")))
    if not chapters:
        raise ValueError(f"office {origin}: OPF spine is empty")
    return "\n\n".join(c for c in chapters if c).strip()


# ------------------------------------------------------------- shared bits


def _normalize(text: str) -> str:
    text = re.sub(r"[ \t]+", " ", text)
    text = "\n".join(ln.strip() for ln in text.split("\n"))
    return re.sub(r"\n{3,}", "\n\n", text).strip()


def office_to_text(payload: bytes, origin: str = "<bytes>") -> tuple:
    """(kind, text) by member sniff; non-office ZIPs refuse by name."""
    kind = sniff_office(payload, origin)
    if kind == "docx":
        return kind, docx_to_text(payload, origin)
    if kind == "odt":
        return kind, odt_to_text(payload, origin)
    if kind == "epub":
        return kind, epub_to_text(payload, origin)
    raise ValueError(
        f"office {origin}: ZIP payload is none of DOCX/ODT/EPUB "
        "(member sniff found no office signature)"
    )


def office_parts(payload: bytes, origin: str = "<bytes>") -> int:
    """Part count for the census: paragraphs (docx/odt) or spine length
    (epub) — cheap enough to ride the classification pass."""
    kind = sniff_office(payload, origin)
    members = _members(payload, origin)
    if kind == "docx":
        root = _parse_xml(
            members["word/document.xml"], origin, "word/document.xml"
        )
        return sum(1 for _ in root.iter(_W_NS + "p"))
    if kind == "odt":
        root = _parse_xml(members["content.xml"], origin, "content.xml")
        return sum(
            1 for node in root.iter()
            if node.tag in (_TEXT_NS + "p", _TEXT_NS + "h")
        )
    if kind == "epub":
        croot = _parse_xml(
            members["META-INF/container.xml"], origin, "container.xml"
        )
        rf = croot.find(f"{_CONTAINER_NS}rootfiles/{_CONTAINER_NS}rootfile")
        opf = members.get(rf.get("full-path") if rf is not None else "")
        if opf is None:
            raise ValueError(f"office {origin}: rootfile missing")
        oroot = _parse_xml(opf, origin, "package.opf")
        return sum(1 for _ in oroot.iter(_OPF_NS + "itemref"))
    raise ValueError(f"office {origin}: not an office document")


OFFICE_TEXT_SCHEMA = "doc_id long, kind string, n_chars long, text string"


def office_text_frame(df, payload_col: str = "payload", id_col: str = "doc_id"):
    """Spark fan-out: one text row per office payload via mapInPandas."""

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "kind": [], "n_chars": [], "text": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                kind, text = office_to_text(bytes(payload), str(doc_id))
                rows["doc_id"].append(doc_id)
                rows["kind"].append(kind)
                rows["n_chars"].append(len(text))
                rows["text"].append(text)
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, OFFICE_TEXT_SCHEMA)
