"""BMP decode vs the public DIB layout: hand-built files over the shared
DIB conversion, refusals by name, and the universal image dispatch."""

from __future__ import annotations

import struct

import pytest

from hbase_observer_es_spark.operators.bmp import decode_bmp, looks_like_bmp


def _bmp(pixel_rows: bytes, w: int, h: int, bits=24, comp=0, height_sign=1) -> bytes:
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h * height_sign, 1, bits, comp, 0, 0, 0, 0, 0
    )
    offset = 14 + len(info)
    body = info + pixel_rows
    return b"BM" + struct.pack("<III", 14 + len(body), 0, offset) + body


_BOTTOM = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"  # blue, green BGR + pad
_TOP = bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"  # red, white


def test_bmp_bottom_up_bgr():
    img = decode_bmp(_bmp(_BOTTOM + _TOP, 2, 2))
    assert (img.width, img.height, img.color_type) == (2, 2, 2)
    assert tuple(img.raw[0:3]) == (255, 0, 0)     # top-left red
    assert tuple(img.raw[9:12]) == (0, 255, 0)    # bottom-right green


def test_bmp_topdown_negative_height():
    img = decode_bmp(_bmp(_BOTTOM + _TOP, 2, 2, height_sign=-1))
    assert tuple(img.raw[0:3]) == (0, 0, 255)  # stored row 0 is the top


def test_bmp_refusals():
    assert looks_like_bmp(_bmp(_BOTTOM + _TOP, 2, 2))
    with pytest.raises(ValueError, match=r"not a BMP"):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match=r"RLE8 unsupported"):
        decode_bmp(_bmp(_BOTTOM + _TOP, 2, 2, comp=1))
    with pytest.raises(ValueError, match=r"8-bit pixels unsupported"):
        decode_bmp(_bmp(_BOTTOM + _TOP, 2, 2, bits=8))
    good = _bmp(_BOTTOM + _TOP, 2, 2)
    with pytest.raises(ValueError, match=r"declared file size"):
        decode_bmp(good + b"\x00")
    with pytest.raises(ValueError, match=r"overruns the file"):
        decode_bmp(_bmp(_BOTTOM, 2, 2))


def test_universal_dispatch_covers_all_four_formats():
    from hbase_observer_es_spark.operators.gif import GIF_MAGICS
    from hbase_observer_es_spark.operators.jpeg import decode_image, encode_jpeg
    from hbase_observer_es_spark.operators.png import PngImage, encode_png

    gray = PngImage(2, 2, 8, 0, 1, 2, bytes([10, 200, 30, 90]), None)
    assert decode_image(encode_png(gray)).raw == gray.raw
    assert decode_image(encode_jpeg(gray, quality=100)).width == 2
    bmp_img = decode_image(_bmp(_BOTTOM + _TOP, 2, 2))
    assert tuple(bmp_img.raw[0:3]) == (255, 0, 0)
    # a minimal GIF through the same door
    from tests.test_gif import _simple_gif

    assert decode_image(_simple_gif([0, 1, 2, 3], 2, 2)).color_type == 2
    with pytest.raises(ValueError, match=r"none of PNG/JPEG/GIF/BMP/TIFF"):
        decode_image(b"\x00\x01\x02\x03 mystery")
    # lossy WebP is recognized and refused BY NAME, not lumped into
    # unknown (lossless VP8L decodes for real — tests/test_vp8l.py)
    vp8_body = b"\x00\x00\x00\x9d\x01\x2a\x02\x00\x02\x00"
    lossy = (b"RIFF" + (4 + 8 + len(vp8_body)).to_bytes(4, "little")
             + b"WEBPVP8 " + len(vp8_body).to_bytes(4, "little") + vp8_body)
    with pytest.raises(NotImplementedError, match=r"lossy VP8 pixel decode"):
        decode_image(lossy)
