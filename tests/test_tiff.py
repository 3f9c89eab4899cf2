"""TIFF IFD walk + uncompressed baseline decode: hand-built files in
both byte orders, strip validation, named refusals."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

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
    assert tiff_meta(lzw)["compression"] == "lzw"
    # LZW decodes for real since r12; garbage declared as LZW is
    # corruption, not a refusal
    with pytest.raises(ValueError, match=r"does not start with CLEAR"):
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


# ------------------------------------------------------------- LZW (r12)
#
# Test-side TIFF-LZW encoder: an INDEPENDENT implementation of the
# 6.0 §13 encoder side (MSB-first packing, EarlyChange — the encoder
# widens when the next table index reaches 2^w, which a decoder sees as
# widening at 2^w − 1 because its table trails by one entry).


def _lzw_encode_msb(data: bytes) -> bytes:
    bits = []  # (code, width)
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    bits.append((256, width))  # mandatory leading CLEAR
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # conservative reset before the 12-bit cap
            bits.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        bits.append((table[w], width))
    bits.append((257, width))  # EOI
    s = "".join(format(c, f"0{wd}b") for c, wd in bits)
    s += "0" * ((8 - len(s) % 8) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _tiff_lzw(rows: list, w, h, endian="<", spp=1, photometric=1,
              predictor=1, rows_per_strip=None) -> bytes:
    """LZW TIFF with one strip per rows_per_strip rows; predictor 2
    applies horizontal differencing before encoding (what a writer does)."""
    rps = rows_per_strip or h
    header = b"II*\x00" if endian == "<" else b"MM\x00*"
    strips = []
    for s0 in range(0, h, rps):
        chunk = b"".join(rows[s0 : s0 + rps])
        if predictor == 2:
            d = bytearray(chunk)
            rb = w * spp
            for r in range(len(d) // rb):
                base = r * rb
                for i in range(base + rb - 1, base + spp - 1, -1):
                    d[i] = (d[i] - d[i - spp]) & 0xFF
            chunk = bytes(d)
        strips.append(_lzw_encode_msb(chunk))
    pos = 8
    offs, cnts = [], []
    payload = b""
    for s in strips:
        offs.append(pos)
        cnts.append(len(s))
        payload += s
        pos += len(s)
    ifd_at = pos
    header += struct.pack(endian + "I", ifd_at)

    entries = [
        _short(endian, 256, w),
        _short(endian, 257, h),
        _short(endian, 258, 8),
        _short(endian, 259, 5),
        _short(endian, 262, photometric),
        _short(endian, 277, spp),
        _long(endian, 278, rps),
    ]
    if len(strips) == 1:
        entries.insert(5, _long(endian, 273, offs[0]))
        entries.append(_long(endian, 279, cnts[0]))
    else:
        # multi-valued LONG arrays live after the IFD; offsets patched in
        n = len(strips)
        ifd_len = 2 + (len(entries) + 2) * 12 + 4  # +2: tags 273 and 279
        arr1_at = ifd_at + ifd_len
        arr2_at = arr1_at + 4 * n
        entries.insert(5, _entry(endian, 273, 4, n,
                                 struct.pack(endian + "I", arr1_at)))
        entries.append(_entry(endian, 279, 4, n,
                              struct.pack(endian + "I", arr2_at)))
    if predictor == 2:
        entries.append(_short(endian, 317, 2))
        if len(strips) > 1:
            raise NotImplementedError  # keep the fixture simple
    entries.sort(key=lambda e: struct.unpack(endian + "H", e[:2])[0])
    ifd = struct.pack(endian + "H", len(entries)) + b"".join(entries)
    ifd += struct.pack(endian + "I", 0)
    tail = b""
    if len(strips) > 1:
        tail = struct.pack(f"{endian}{len(strips)}I", *offs)
        tail += struct.pack(f"{endian}{len(strips)}I", *cnts)
    return header + payload + ifd + tail


def test_lzw_handpacked_golden():
    """'ABABAB' by hand: codes CLEAR,65,66,258,258,EOI all at width 9
    (table never reaches 511) → bit string 100000000 001000001 001000010
    100000010 100000010 100000001 + zero pad = 80 10 48 50 28 14 04."""
    assert _lzw_encode_msb(b"ABABAB") == bytes(
        [0x80, 0x10, 0x48, 0x50, 0x28, 0x14, 0x04]
    )
    from hbase_observer_es_spark.operators.tiff import _lzw_decode_msb

    assert _lzw_decode_msb(_lzw_encode_msb(b"ABABAB"), 6, "t", 0) == b"ABABAB"


def test_lzw_tiff_decodes_gray_and_rgb():
    rows = [bytes([10, 20, 15, 5]), bytes([200, 200, 200, 200])]
    img = decode_tiff(_tiff_lzw(rows, 4, 2))
    assert (img.width, img.height, img.color_type) == (4, 2, 0)
    assert img.raw == b"".join(rows)
    rgb_rows = [bytes(range(12)), bytes(range(100, 112))]
    img = decode_tiff(_tiff_lzw(rgb_rows, 4, 2, spp=3, photometric=2))
    assert (img.color_type, img.raw) == (2, b"".join(rgb_rows))


def test_lzw_tiff_predictor2_and_big_endian():
    rows = [bytes([10, 20, 15, 5, 0, 255, 1, 128])]
    img = decode_tiff(_tiff_lzw(rows, 8, 1, predictor=2))
    assert img.raw == rows[0]
    img = decode_tiff(_tiff_lzw(rows, 8, 1, endian=">", predictor=2))
    assert img.raw == rows[0]
    # rgb predictor differences per-channel, not per-byte
    rgb = [bytes([100, 50, 25, 110, 45, 35, 90, 60, 25])]
    img = decode_tiff(_tiff_lzw(rgb, 3, 1, spp=3, photometric=2, predictor=2))
    assert img.raw == rgb[0]


def test_lzw_tiff_multistrip_independent_streams():
    rows = [bytes([i] * 6) for i in range(4)]
    img = decode_tiff(_tiff_lzw(rows, 6, 4, rows_per_strip=2))
    assert img.raw == b"".join(rows)


def test_lzw_width_growth_round_trip():
    """768 low-entropy-free bytes force >254 dictionary entries — the
    EarlyChange 9→10-bit switch happens mid-strip on both sides."""
    from hbase_observer_es_spark.operators.tiff import _lzw_decode_msb

    data = bytes(range(256)) * 3
    enc = _lzw_encode_msb(data)
    assert _lzw_decode_msb(enc, len(data), "t", 0) == data


def test_lzw_corrupt_streams_fail_loudly():
    from hbase_observer_es_spark.operators.tiff import _lzw_decode_msb

    good = _lzw_encode_msb(b"ABABAB")
    with pytest.raises(ValueError, match=r"does not start with CLEAR"):
        _lzw_decode_msb(b"\x00" + good[1:], 6, "t", 0)
    with pytest.raises(ValueError, match=r"ends without EOI"):
        _lzw_decode_msb(good[:3], 6, "t", 0)
    with pytest.raises(ValueError, match=r"produced 6 of 7"):
        _lzw_decode_msb(good, 7, "t", 0)
    with pytest.raises(ValueError, match=r"inflates past"):
        _lzw_decode_msb(good, 3, "t", 0)


def test_old_jpeg_still_refused_by_name():
    """CCITT and new-style JPEG decode for real since r13
    (tests/test_ccittfax.py, test_jpeg_in_tiff below) — an 8-bit IFD
    claiming fax compression is now malformed, and the remaining named
    refusal is the deprecated old-style JPEG (compression 6)."""
    data = _tiff(bytes(4), 2, 2, compression=3)
    assert tiff_meta(data)["compression"] == "ccitt-g3-fax"
    with pytest.raises(ValueError, match=r"requires 1 bit/sample"):
        decode_tiff(data)
    jp = _tiff(bytes(4), 2, 2, compression=6)
    assert tiff_meta(jp)["compression"] == "old-jpeg"
    with pytest.raises(ValueError, match=r"old-jpeg compression unsupported"):
        decode_tiff(jp)


def test_predictor_outside_lzw_refused():
    data = _tiff_lzw([bytes([1, 2])], 2, 1, predictor=2)
    # flip compression 5 -> 1 in the IFD (tag 259 SHORT little-endian)
    patched = data.replace(
        struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 5, 0),
        struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 1, 0),
    )
    assert patched != data
    with pytest.raises(ValueError, match=r"predictor 2 outside LZW"):
        decode_tiff(patched)


@given(st.binary(min_size=0, max_size=1500))
@settings(max_examples=40, deadline=None)
def test_lzw_round_trip_property(data):
    from hbase_observer_es_spark.operators.tiff import _lzw_decode_msb

    if not data:
        enc = _lzw_encode_msb(data)
        assert _lzw_decode_msb(enc, 0, "t", 0) == b""
        return
    enc = _lzw_encode_msb(data)
    assert _lzw_decode_msb(enc, len(data), "t", 0) == data


def test_packbits_and_deflate_decode():
    """Compression 32773 (PackBits) and 8/32946 (Deflate) decode for
    real; fixtures hand-built per TIFF 6.0 §9 and stdlib zlib."""
    import zlib

    px = bytes([7, 7, 7, 7, 9, 1, 2, 3])  # 4x2 gray
    # packbits: repeat 7 x4 (control -3 = 0xFD), literals 9,1,2,3 (ctrl 3)
    pb = bytes([0xFD, 7, 3, 9, 1, 2, 3])
    assert decode_tiff(_tiff(pb, 4, 2, compression=32773)).raw == px
    for tag in (8, 32946):
        z = zlib.compress(px)
        assert decode_tiff(_tiff(z, 4, 2, compression=tag)).raw == px
    # deflate + predictor 2
    rows = [bytes([10, 20, 15, 5])]
    d = bytearray(rows[0])
    for i in range(3, 0, -1):
        d[i] = (d[i] - d[i - 1]) & 0xFF
    data = _tiff(zlib.compress(bytes(d)), 4, 1, compression=8)
    # splice predictor tag: rebuild via the lzw fixture path instead
    img = decode_tiff(data)  # without predictor the deltas come out raw
    assert img.raw == bytes(d)


def test_packbits_corrupt_streams_fail_loudly():
    with pytest.raises(ValueError, match=r"ends mid-stream"):
        decode_tiff(_tiff(bytes([0xFD, 7]), 4, 2, compression=32773))
    with pytest.raises(ValueError, match=r"inflates past"):
        decode_tiff(_tiff(bytes([0x81, 7] * 9), 4, 2, compression=32773))
    with pytest.raises(ValueError, match=r"literal run overruns"):
        decode_tiff(_tiff(bytes([7, 1, 2]), 4, 2, compression=32773))
    import zlib
    with pytest.raises(ValueError, match=r"not a zlib stream"):
        decode_tiff(_tiff(b"nope", 2, 2, compression=8))
    with pytest.raises(ValueError, match=r"produced 3 of 4"):
        decode_tiff(_tiff(zlib.compress(b"abc"), 2, 2, compression=8))
    with pytest.raises(ValueError, match=r"inflates past"):
        decode_tiff(_tiff(zlib.compress(b"abcde"), 2, 2, compression=8))
    with pytest.raises(ValueError, match=r"requires 1 bit/sample"):
        decode_tiff(_tiff(bytes(4), 2, 2, compression=4))


@given(st.binary(min_size=1, max_size=400))
@settings(max_examples=30, deadline=None)
def test_packbits_round_trip_property(data):
    """Independent test-side PackBits encoder (literal/repeat runs) →
    production decoder recovers the bytes."""
    from hbase_observer_es_spark.operators.tiff import _packbits_decode

    out = bytearray()
    i = 0
    while i < len(data):
        j = i
        while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 126:
            j += 1
        if j > i:  # repeat run of length j-i+1 >= 2
            out += bytes([(1 - (j - i + 1)) & 0xFF, data[i]])
            i = j + 1
        else:  # literal run until the next 2-byte repeat
            k = i
            while (
                k + 1 < len(data)
                and not (k + 2 < len(data) and data[k + 1] == data[k + 2])
                and k - i < 127
            ):
                k += 1
            out += bytes([k - i]) + data[i : k + 1]
            i = k + 1
    assert _packbits_decode(bytes(out), len(data), "t", 0) == data


# ------------------------------------------------- JPEG-in-TIFF (comp 7)

def _split_jpeg_tables(stream: bytes) -> tuple:
    """Move DQT/DHT/DRI segments out of a complete JPEG stream into an
    abbreviated SOI…EOI tables stream (what a JPEGTables writer does)."""
    assert stream[:2] == b"\xff\xd8"
    pos = 2
    tables = b""
    keep = b"\xff\xd8"
    while pos < len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data + EOI follow verbatim
            keep += stream[pos:]
            break
        (ln,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        seg = stream[pos : pos + 2 + ln]
        if marker in (0xDB, 0xC4, 0xDD):  # DQT / DHT / DRI
            tables += seg
        else:
            keep += seg
        pos += 2 + ln
    return b"\xff\xd8" + tables + b"\xff\xd9", keep


def _jpeg_tiff(strips: list, w, h, rows_per_strip=None, tables=None,
               photometric=6) -> bytes:
    """Compression-7 TIFF: JPEG strip payloads, optional JPEGTables."""
    e = "<"
    rps = rows_per_strip or h
    pos = 8
    offs, cnts, payload = [], [], b""
    for s in strips:
        offs.append(pos)
        cnts.append(len(s))
        payload += s
        pos += len(s)
    ifd_at = pos
    header = b"II*\x00" + struct.pack(e + "I", ifd_at)
    n_entries = 9 + (1 if tables else 0)
    blobs_at = ifd_at + 2 + n_entries * 12 + 4
    blobs = b""

    def arr_long(tag, vals):
        nonlocal blobs
        if len(vals) == 1:
            return _entry(e, tag, 4, 1, struct.pack(e + "I", vals[0]))
        at = blobs_at + len(blobs)
        blobs += struct.pack(f"{e}{len(vals)}I", *vals)
        return _entry(e, tag, 4, len(vals), struct.pack(e + "I", at))

    entries = [
        _short(e, 256, w), _short(e, 257, h), _short(e, 258, 8),
        _short(e, 259, 7), _short(e, 262, photometric),
        arr_long(273, offs), _short(e, 277, 1),
        _long(e, 278, rps), arr_long(279, cnts),
    ]
    if tables:
        at = blobs_at + len(blobs)
        blobs += tables
        entries.append(
            _entry(e, 347, 7, len(tables), struct.pack(e + "I", at)))
    entries.sort(key=lambda x: struct.unpack(e + "H", x[:2])[0])
    ifd = struct.pack(e + "H", len(entries)) + b"".join(entries)
    ifd += struct.pack(e + "I", 0)
    return header + payload + ifd + blobs


def _gradient_img(w, h, channels=3, seed=0):
    from hbase_observer_es_spark.operators.png import PngImage

    raw = bytes(
        (x * 11 + y * 17 + c * 5 + seed) % 256
        for y in range(h) for x in range(w) for c in range(channels)
    )
    ct = 2 if channels == 3 else 0
    return PngImage(w, h, 8, ct, channels, w * channels, raw, None)


def test_jpeg_in_tiff_single_strip_gray():
    from hbase_observer_es_spark.operators.jpeg import decode_jpeg, encode_jpeg

    stream = encode_jpeg(_gradient_img(16, 8, channels=1), quality=90)
    data = _jpeg_tiff([stream], 16, 8, photometric=1)
    assert tiff_meta(data)["compression"] == "jpeg"
    img = decode_tiff(data)
    assert (img.width, img.height, img.color_type) == (16, 8, 0)
    assert img.raw == decode_jpeg(stream).raw


def test_jpeg_in_tiff_two_strips_with_shared_tables():
    """The TIFF-EP layout: DQT/DHT live once in JPEGTables; each strip
    is an abbreviated stream spliced back together before decode."""
    from hbase_observer_es_spark.operators.jpeg import decode_jpeg, encode_jpeg

    top = encode_jpeg(_gradient_img(16, 8, seed=0), quality=90)
    bot = encode_jpeg(_gradient_img(16, 8, seed=3), quality=90)
    tables, top_bare = _split_jpeg_tables(top)
    assert len(top_bare) < len(top)  # the split moved something
    # strip 0 relies on the shared tables; strip 1 stays self-contained
    # (its own DQT/DHT arrive after the splice and override — the spec's
    # per-strip override rule)
    data = _jpeg_tiff([top_bare, bot], 16, 16, rows_per_strip=8,
                      tables=tables)
    img = decode_tiff(data)
    assert (img.width, img.height, img.channels) == (16, 16, 3)
    assert img.raw == decode_jpeg(top).raw + decode_jpeg(bot).raw


def test_jpeg_in_tiff_guards():
    from hbase_observer_es_spark.operators.jpeg import encode_jpeg

    stream = encode_jpeg(_gradient_img(16, 8), quality=90)
    with pytest.raises(ValueError, match=r"JPEGTables is not an SOI"):
        decode_tiff(_jpeg_tiff([stream], 16, 8, tables=b"\x00\x01\x02\x03"))
    with pytest.raises(ValueError, match=r"strip 0 does not start with SOI"):
        decode_tiff(_jpeg_tiff([b"\x00" + stream], 16, 8))
    # geometry mismatch: strip decodes 8 rows, IFD claims 6
    with pytest.raises(ValueError, match=r"decodes 16x8, the geometry needs 16x6"):
        decode_tiff(_jpeg_tiff([stream], 16, 6))
