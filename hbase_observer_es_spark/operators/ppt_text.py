"""Legacy binary PowerPoint (``.ppt``) text extraction — from the
public MS-PPT Open Specification, over the ``cfb.py`` container.

The third legacy-Office leg. The ``PowerPoint Document`` stream is a
tree of 8-byte-headed records (version/instance, type, length;
version ``0xF`` marks a container). Text lives in exactly two atom
types — ``TextCharsAtom`` (UTF-16LE) and ``TextBytesAtom`` (the
compressed low-byte form, latin-1) — so the simplest-form extraction
is a guarded depth-first walk collecting them in stream order.

The catch is FAST-SAVED files: PowerPoint appends incremental edits,
so a multi-edit stream carries STALE records whose text a naive walk
would duplicate or resurrect. The honest subset: read the
``Current User`` stream's ``CurrentUserAtom`` (plain-text header token
required — the encrypted token refuses by name), follow
``offsetToCurrentEdit`` to the ``UserEditAtom``, and REFUSE BY NAME
when ``offsetLastEdit`` is nonzero (an edit chain exists); a
single-edit stream's record order IS document order. Full fast-save
resolution (persist directories, slide-id indirection) is out of
scope for a text pipeline and refusing is the loud surface.

Guards: record lengths are attacker data — a record overrunning its
container or the stream names its byte offset; container depth is
capped (stack bombs); the UserEditAtom offset is validated against the
stream.

Scale posture: one payload per task (the census calls this inside its
mapInPandas pass); the walk is linear in the stream.

Reference parity: none — builder-brief document-pipeline surface
(SURVEY §2-D), beside ``doc_text.py``/``xls_text.py``.
"""

from __future__ import annotations

import struct

from .cfb import cfb_subformat, parse_cfb

_RT_USER_EDIT = 0x0FF5
_RT_TEXT_CHARS = 0x0FA0
_RT_TEXT_BYTES = 0x0FA8
_RT_SLIDE = 0x03EE

_PLAIN_TOKEN = 0xE391C05F
_ENCRYPTED_TOKEN = 0xF3D1C4DF

_MAX_DEPTH = 64


def _header(data: bytes, at: int, origin: str) -> tuple:
    if at + 8 > len(data):
        raise ValueError(
            f"ppt {origin}: truncated record header at byte {at}"
        )
    ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, at)
    return ver_inst & 0x000F, rtype, rlen


def _walk(data: bytes, start: int, end: int, origin: str, depth: int,
          texts: list, counts: dict) -> None:
    if depth > _MAX_DEPTH:
        raise ValueError(
            f"ppt {origin}: record nesting deeper than {_MAX_DEPTH} at "
            f"byte {start} — refusing (container bomb)"
        )
    at = start
    while at < end:
        ver, rtype, rlen = _header(data, at, origin)
        body = at + 8
        if body + rlen > end:
            raise ValueError(
                f"ppt {origin}: record {rtype:#06x} at byte {at} declares "
                f"{rlen} bytes past its container"
            )
        counts[rtype] = counts.get(rtype, 0) + 1
        if ver == 0xF:  # container
            _walk(data, body, body + rlen, origin, depth + 1, texts, counts)
        elif rtype == _RT_TEXT_CHARS:
            if rlen % 2:
                raise ValueError(
                    f"ppt {origin}: TextCharsAtom at byte {at} has odd "
                    f"length {rlen}"
                )
            texts.append(data[body : body + rlen].decode("utf-16-le"))
        elif rtype == _RT_TEXT_BYTES:
            texts.append(data[body : body + rlen].decode("latin-1"))
        at = body + rlen


def _current_edit_offset(cfb, origin: str) -> int:
    try:
        cu = cfb.read_stream("Current User")
    except ValueError as exc:
        raise ValueError(
            f"ppt {origin}: no Current User stream: {exc}"
        ) from exc
    # RecordHeader(8) + size(4) + token(4) + offsetToCurrentEdit(4)
    if len(cu) < 20:
        raise ValueError(
            f"ppt {origin}: Current User stream of {len(cu)} bytes is "
            "shorter than the CurrentUserAtom (need 20)"
        )
    # RecordHeader (8) then size(4), headerToken(4), offsetToCurrentEdit(4)
    token, offset = struct.unpack_from("<II", cu, 12)
    if token == _ENCRYPTED_TOKEN:
        raise NotImplementedError(
            f"ppt {origin}: encrypted presentation (CryptoAPI header "
            "token) not implemented; decrypt upstream"
        )
    if token != _PLAIN_TOKEN:
        raise ValueError(
            f"ppt {origin}: CurrentUserAtom header token {token:#010x} "
            "is neither the plain nor the encrypted constant"
        )
    return offset


def ppt_to_text(payload: bytes, origin: str = "<bytes>") -> str:
    """All text atoms of a SINGLE-EDIT presentation in stream order,
    one line per atom (see module docstring for the fast-save refusal)."""
    return _extract(parse_cfb(payload, origin), origin)[2]


def _extract(cfb, origin: str) -> tuple:
    """(texts, record-type counts, normalized text) — ONE parse, ONE
    walk; ``ppt_to_text``/``ppt_meta``/``doc_text.doc_meta`` all ride
    this so the census never parses a payload twice."""
    from .office_text import _normalize

    if cfb_subformat(cfb) != "ppt":
        raise ValueError(
            f"ppt {origin}: compound file has no PowerPoint Document "
            "stream"
        )
    doc = cfb.read_stream("PowerPoint Document")
    edit_at = _current_edit_offset(cfb, origin)
    if edit_at + 8 > len(doc):
        raise ValueError(
            f"ppt {origin}: offsetToCurrentEdit {edit_at} outside the "
            f"{len(doc)}-byte document stream"
        )
    _ver, rtype, rlen = _header(doc, edit_at, origin)
    if rtype != _RT_USER_EDIT:
        raise ValueError(
            f"ppt {origin}: record at offsetToCurrentEdit {edit_at} is "
            f"{rtype:#06x}, not a UserEditAtom"
        )
    # offsetLastEdit sits at body offset 8..12: bound BOTH the declared
    # record length and the stream before unpacking (struct.error is not
    # a ValueError and would escape the census fold)
    if rlen < 12 or edit_at + 8 + 12 > len(doc):
        raise ValueError(
            f"ppt {origin}: UserEditAtom at byte {edit_at} truncated "
            f"(record length {rlen}, stream {len(doc)} bytes)"
        )
    (offset_last_edit,) = struct.unpack_from("<I", doc, edit_at + 8 + 8)
    if offset_last_edit != 0:
        raise NotImplementedError(
            f"ppt {origin}: fast-saved presentation (UserEditAtom edit "
            f"chain at byte {offset_last_edit}) — incremental-edit "
            "resolution via the persist directory is not implemented, "
            "and walking stale records would duplicate text; re-save "
            "without fast save upstream"
        )
    texts: list = []
    counts: dict = {}
    _walk(doc, 0, len(doc), origin, 0, texts, counts)
    return texts, counts, _normalize("\n".join(texts))


def ppt_meta(payload: bytes, origin: str = "<bytes>") -> dict:
    """Census facts: slide-container count + extracted character count
    (one parse, one walk)."""
    _texts, counts, text = _extract(parse_cfb(payload, origin), origin)
    return {"n_slides": counts.get(_RT_SLIDE, 0), "n_chars": len(text)}
