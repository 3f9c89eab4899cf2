"""WebP header walk: hand-built RIFF chunks for all three variants,
guards, the named pixel-decode refusal through the image dispatch, and
the Spark fan-out."""

from __future__ import annotations

import struct

import pytest

from hbase_observer_es_spark.operators.webpmeta import (
    decode_webp_pixels,
    looks_like_webp,
    webp_meta,
    webp_meta_frame,
)


def _chunk(cc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cc + struct.pack("<I", len(body)) + body + pad


def _webp(*chunks: bytes) -> bytes:
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vp8_chunk(w=320, h=240) -> bytes:
    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + b"\x00" * 6
    return _chunk(b"VP8 ", body)


def _vp8l_chunk(w=100, h=50, alpha=False) -> bytes:
    bits = (w - 1) | ((h - 1) << 14) | ((1 << 28) if alpha else 0)
    return _chunk(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 4)


def _vp8x_chunk(w, h, alpha=False, anim=False) -> bytes:
    flags = (0x10 if alpha else 0) | (0x02 if anim else 0)
    body = bytes([flags, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    return _chunk(b"VP8X", body)


def test_lossy_geometry():
    m = webp_meta(_webp(_vp8_chunk(320, 240)))
    assert m == {"kind": "lossy", "width": 320, "height": 240,
                 "has_alpha": False, "animated": False, "n_frames": 1}


def test_lossless_geometry_and_alpha():
    m = webp_meta(_webp(_vp8l_chunk(100, 50, alpha=True)))
    assert (m["kind"], m["width"], m["height"], m["has_alpha"]) == (
        "lossless", 100, 50, True)


def test_extended_animation():
    data = _webp(
        _vp8x_chunk(640, 360, alpha=True, anim=True),
        _chunk(b"ANMF", b"\x00" * 16),
        _chunk(b"ANMF", b"\x00" * 16),
    )
    m = webp_meta(data)
    assert m == {"kind": "extended", "width": 640, "height": 360,
                 "has_alpha": True, "animated": True, "n_frames": 2}


def test_refusals():
    assert looks_like_webp(_webp(_vp8_chunk()))
    with pytest.raises(ValueError, match=r"not a RIFF/WEBP"):
        webp_meta(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match=r"RIFF size"):
        webp_meta(_webp(_vp8_chunk()) + b"\x00")
    with pytest.raises(ValueError, match=r"key-frame start code missing"):
        webp_meta(_webp(_chunk(b"VP8 ", b"\x00" * 12)))
    with pytest.raises(ValueError, match=r"VP8L signature byte 0x00"):
        webp_meta(_webp(_chunk(b"VP8L", b"\x00" * 8)))
    with pytest.raises(ValueError, match=r"no VP8/VP8L/VP8X image chunk"):
        webp_meta(_webp(_chunk(b"EXIF", b"\x00" * 4)))
    with pytest.raises(ValueError, match=r"declares animation but no ANMF"):
        webp_meta(_webp(_vp8x_chunk(10, 10, anim=True)))


def test_lossy_pixel_decode_refused_by_name_through_dispatch():
    """VP8L decodes for real since r12 (tests/test_vp8l.py); LOSSY VP8
    keeps the named refusal, through both entry points."""
    from hbase_observer_es_spark.operators.jpeg import decode_image

    with pytest.raises(
        NotImplementedError, match=r"webp doc-8: lossy VP8 pixel decode"
    ):
        decode_webp_pixels(_webp(_vp8_chunk()), origin="doc-8")
    with pytest.raises(
        NotImplementedError, match=r"webp doc-9: lossy VP8 pixel decode"
    ):
        decode_image(_webp(_vp8_chunk()), origin="doc-9")


def test_meta_through_spark(spark):
    df = spark.createDataFrame(
        [(1, _webp(_vp8_chunk(320, 240))), (2, _webp(_vp8l_chunk(7, 9)))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: (r.kind, r.width, r.height) for r in webp_meta_frame(df).collect()}
    assert rows == {1: ("lossy", 320, 240), 2: ("lossless", 7, 9)}
