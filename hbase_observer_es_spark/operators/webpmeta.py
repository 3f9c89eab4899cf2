"""WebP metadata from the public RIFF/VP8 bitstream headers, stdlib-only.

WebP is everywhere on the modern web. Since r12 the LOSSLESS half
(VP8L) decodes its pixels for real (``operators/vp8l.py``, routed via
:func:`decode_webp_pixels`), and since r13 animated lossless files
compose their frames for real too (``operators/webpanim.py``); lossy
VP8 (boolean arithmetic coder + loop filter — not stdlib-expressible)
keeps the named-refusal convention, with the header walk as its real
surface: a curation pipeline filters images on geometry and kind
(lossy/lossless/alpha/animated) long before it decodes them. Extracted
from the public layouts:

* RIFF container: ``RIFF`` size ``WEBP``, chunk walk with even padding
  (the WAV/AVI sibling);
* ``VP8 `` (lossy): the key-frame start code ``9D 01 2A`` then 14-bit
  little-endian width/height;
* ``VP8L`` (lossless): the ``2F`` signature byte then 14-bit-minus-one
  width/height fields and the alpha bit;
* ``VP8X`` (extended): the feature flags (alpha, animation, EXIF, XMP)
  and the 24-bit-minus-one canvas size; animated files report the
  ``ANMF`` frame count.

``webp_meta_frame`` is the Spark fan-out (one typed row per payload);
``decode_webp_pixels`` is the loud named refusal the image dispatch
routes to.

Reference parity: none — builder-brief multimodal surface, SURVEY §2-D.
"""

from __future__ import annotations

import struct


def looks_like_webp(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"


def webp_meta(data: bytes, origin: str = "<bytes>") -> dict:
    if not looks_like_webp(data):
        raise ValueError(
            f"webp {origin}: not a RIFF/WEBP stream "
            f"(bytes 0-3 {data[:4]!r}, 8-11 {data[8:12]!r})"
        )
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 != len(data):
        raise ValueError(
            f"webp {origin}: RIFF size {riff_size} + 8 != file size {len(data)}"
        )
    pos = 12
    kind = None
    width = height = 0
    has_alpha = False
    animated = False
    n_frames = 0
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError(f"webp {origin}: truncated chunk header at byte {pos}")
        cc = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + length > len(data):
            raise ValueError(
                f"webp {origin}: chunk {cc!r} at byte {pos} overruns the file"
            )
        if cc == b"VP8 " and kind is None:
            if length < 10:
                raise ValueError(f"webp {origin}: VP8 chunk of {length} bytes truncated")
            if data[body + 3 : body + 6] != b"\x9d\x01\x2a":
                raise ValueError(
                    f"webp {origin}: VP8 key-frame start code missing "
                    "(inter-frame-only payload?)"
                )
            (w_raw,) = struct.unpack("<H", data[body + 6 : body + 8])
            (h_raw,) = struct.unpack("<H", data[body + 8 : body + 10])
            kind, width, height = "lossy", w_raw & 0x3FFF, h_raw & 0x3FFF
        elif cc == b"VP8L" and kind is None:
            if length < 5:
                raise ValueError(f"webp {origin}: VP8L chunk truncated")
            if data[body] != 0x2F:
                raise ValueError(
                    f"webp {origin}: VP8L signature byte "
                    f"0x{data[body]:02X} != 0x2F"
                )
            (bits,) = struct.unpack("<I", data[body + 1 : body + 5])
            kind = "lossless"
            width = (bits & 0x3FFF) + 1
            height = ((bits >> 14) & 0x3FFF) + 1
            has_alpha = bool((bits >> 28) & 1)
        elif cc == b"VP8X":
            if length < 10:
                raise ValueError(f"webp {origin}: VP8X chunk truncated")
            flags = data[body]
            has_alpha = has_alpha or bool(flags & 0x10)
            animated = bool(flags & 0x02)
            width = int.from_bytes(data[body + 4 : body + 7], "little") + 1
            height = int.from_bytes(data[body + 7 : body + 10], "little") + 1
            kind = kind or "extended"
        elif cc == b"ALPH":
            has_alpha = True
        elif cc == b"ANMF":
            n_frames += 1
        pos = body + length + (length & 1)
    if kind is None:
        raise ValueError(f"webp {origin}: no VP8/VP8L/VP8X image chunk")
    if animated and n_frames == 0:
        raise ValueError(
            f"webp {origin}: VP8X declares animation but no ANMF frames follow"
        )
    return {
        "kind": kind,
        "width": width,
        "height": height,
        "has_alpha": has_alpha,
        "animated": animated,
        "n_frames": n_frames if animated else 1,
    }


def decode_webp_pixels(payload: bytes, origin: str = "<bytes>"):
    """Lossless (VP8L) pixels decode FOR REAL from the public bitstream
    spec (``operators/vp8l.py``, r12) → PngImage. Animated files whose
    frames are VP8L compose for real too (``operators/webpanim.py``,
    r13) — this returns the FIRST composed frame, the ``decode_gif``
    static-view contract. Lossy VP8 pixels (boolean arithmetic coder +
    loop filter — not stdlib-expressible) stay a loud named refusal,
    still or animated; the header walk (:func:`webp_meta`) remains the
    surface for those."""
    meta = webp_meta(payload, origin)  # container validation first
    if meta["animated"]:
        from .webpanim import iter_webp_frames

        return next(iter_webp_frames(payload, origin)).image
    pos = 12
    while pos < len(payload):
        cc = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cc == b"VP8L":
            from .vp8l import decode_vp8l

            return decode_vp8l(payload[pos + 8 : pos + 8 + length], origin)
        pos += 8 + length + (length & 1)
    raise NotImplementedError(
        f"webp {origin}: lossy VP8 pixel decode not implemented (the "
        "boolean arithmetic coder + loop filter are not "
        "stdlib-expressible; lossless VP8L decodes for real, webp_meta "
        "is the surface for lossy files)"
    )


WEBP_META_SCHEMA = (
    "kind string, width long, height long, has_alpha boolean,"
    " animated boolean, n_frames long"
)


def webp_meta_frame(df, payload_col: str = "payload", id_col: str = "doc_id"):
    """mapInPandas metadata extraction over a binary WebP column."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    id_col, "kind", "width", "height", "has_alpha",
                    "animated", "n_frames",
                )
            }
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                m = webp_meta(bytes(payload), origin=str(key))
                rows[id_col].append(key)
                for k, v in m.items():
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, f"{id_col} long, {WEBP_META_SCHEMA}")
