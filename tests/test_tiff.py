"""TIFF IFD walk + uncompressed baseline decode: hand-built files in
both byte orders, strip validation, named refusals."""

from __future__ import annotations

import struct

import pytest

from hbase_observer_es_spark.operators.tiff import (
    decode_tiff,
    looks_like_tiff,
    tiff_meta,
)


def _entry(endian, tag, typ, count, value_bytes) -> bytes:
    assert len(value_bytes) <= 4
    return struct.pack(endian + "HHI", tag, typ, count) + value_bytes.ljust(4, b"\x00")


def _short(endian, tag, v) -> bytes:
    return _entry(endian, tag, 3, 1, struct.pack(endian + "H", v))


def _long(endian, tag, v) -> bytes:
    return _entry(endian, tag, 4, 1, struct.pack(endian + "I", v))


def _tiff(pixels: bytes, w, h, endian="<", photometric=1, spp=1,
          compression=1, next_ifd=0) -> bytes:
    """Header + pixel strip + one IFD (strip offset = 8)."""
    header = (b"II*\x00" if endian == "<" else b"MM\x00*")
    strip_at = 8
    ifd_at = strip_at + len(pixels)
    header += struct.pack(endian + "I", ifd_at)
    entries = [
        _short(endian, 256, w),
        _short(endian, 257, h),
        _short(endian, 258, 8),
        _short(endian, 259, compression),
        _short(endian, 262, photometric),
        _long(endian, 273, strip_at),
        _short(endian, 277, spp),
        _long(endian, 278, h),
        _long(endian, 279, len(pixels)),
    ]
    ifd = struct.pack(endian + "H", len(entries)) + b"".join(entries)
    ifd += struct.pack(endian + "I", next_ifd)
    return header + pixels + ifd


def test_meta_both_endians():
    for endian, big in (("<", False), (">", True)):
        data = _tiff(bytes(6), 3, 2, endian=endian)
        m = tiff_meta(data)
        assert m == {
            "width": 3, "height": 2, "bits_per_sample": 8,
            "samples_per_pixel": 1, "compression": "none",
            "photometric": 1, "n_pages": 1, "big_endian": big,
        }


def test_gray_decode_both_polarities():
    px = bytes([0, 100, 200, 255])
    img = decode_tiff(_tiff(px, 2, 2, photometric=1))
    assert (img.color_type, img.raw) == (0, px)
    inverted = decode_tiff(_tiff(px, 2, 2, photometric=0))
    assert inverted.raw == bytes([255, 155, 55, 0])  # WhiteIsZero flipped


def test_rgb_decode_and_alpha_drop():
    rgb = bytes([255, 0, 0, 0, 255, 0])
    img = decode_tiff(_tiff(rgb, 2, 1, photometric=2, spp=3))
    assert (img.color_type, img.raw) == (2, rgb)
    rgba = bytes([255, 0, 0, 9, 0, 255, 0, 9])
    img = decode_tiff(_tiff(rgba, 2, 1, photometric=2, spp=4))
    assert img.raw == rgb  # alpha dropped


def test_multipage_counted():
    page1 = _tiff(bytes(4), 2, 2)
    # append a COPY of the first IFD and point page1's next-IFD at it
    second_at = len(page1)
    first_ifd_at = struct.unpack("<I", page1[4:8])[0]
    data = bytearray(page1 + page1[first_ifd_at:])
    next_ptr_at = first_ifd_at + 2 + 9 * 12
    data[next_ptr_at : next_ptr_at + 4] = struct.pack("<I", second_at)
    assert tiff_meta(bytes(data))["n_pages"] == 2


def test_ifd_loop_is_loud():
    data = bytearray(_tiff(bytes(4), 2, 2))
    first_ifd_at = struct.unpack("<I", data[4:8])[0]
    next_ptr_at = first_ifd_at + 2 + 9 * 12
    data[next_ptr_at : next_ptr_at + 4] = struct.pack("<I", first_ifd_at)
    with pytest.raises(ValueError, match=r"IFD chain loops back"):
        tiff_meta(bytes(data))


def test_refusals():
    assert looks_like_tiff(_tiff(bytes(4), 2, 2))
    assert not looks_like_tiff(b"BM\x00\x00")
    with pytest.raises(ValueError, match=r"not a TIFF stream"):
        tiff_meta(b"PK\x03\x04....")
    with pytest.raises(ValueError, match=r"BigTIFF \(magic 43\) unsupported"):
        tiff_meta(b"II+\x00" + b"\x00" * 12)
    lzw = _tiff(bytes(4), 2, 2, compression=5)
    assert tiff_meta(lzw)["compression"] == "lzw"  # meta still reports it
    with pytest.raises(ValueError, match=r"lzw compression unsupported for decode"):
        decode_tiff(lzw)
    short_strip = _tiff(bytes(3), 2, 2)  # geometry needs 4
    with pytest.raises(ValueError, match=r"strip 0 carries 3 bytes"):
        decode_tiff(short_strip)


def test_composes_with_pixel_stack():
    from hbase_observer_es_spark.operators.imagehash import average_hash
    from hbase_observer_es_spark.operators.png import encode_png

    img = decode_tiff(_tiff(bytes(range(64)), 8, 8))
    assert len(encode_png(img)) > 0
    assert 0 <= average_hash(img) < (1 << 64)


def test_dispatch_and_census_route_tiff():
    from hbase_observer_es_spark.operators.jpeg import decode_image
    from hbase_observer_es_spark.operators.media_census import classify_media

    data = _tiff(bytes(range(64)), 8, 8)
    assert decode_image(data).width == 8
    r = classify_media(data)
    assert (r["family"], r["format"], r["width"], r["n_frames"]) == (
        "image", "tiff-none", 8, 1)
    lzw = _tiff(bytes(4), 2, 2, compression=5)
    assert classify_media(lzw)["format"] == "tiff-lzw"  # surveyed, not erroring


def test_truncation_and_empty_chain_are_valueerrors():
    """Census survival: a 4-byte magic-only payload and a zero first-IFD
    offset must both die as ValueError, never struct.error/StopIteration."""
    from hbase_observer_es_spark.operators.media_census import classify_media

    with pytest.raises(ValueError, match=r"too short for a TIFF header"):
        tiff_meta(b"II*\x00")
    with pytest.raises(ValueError, match=r"no IFD in the chain"):
        decode_tiff(b"II*\x00\x00\x00\x00\x00")
    assert classify_media(b"II*\x00")["family"] == "error"
