"""PNG decoder vs the public spec: forward-filtered synthetic images must
reconstruct bit-exactly, a hand-derived byte-literal golden pins the filter
arithmetic (the Avro hand-encoded-bytes discipline), and every structural
violation dies loudly. The test encoder applies filters FORWARD
(filtered = raw - predictor) — the genuine inverse of the decoder's
reconstruction, so a round-trip match is evidence, not tautology."""

from __future__ import annotations

import struct
import zlib

import pytest

from hbase_observer_es_spark.operators.png import (
    PNG_MAGIC,
    decode_png,
    parse_ihdr,
)

# ---------------------------------------------------------------- test encoder


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _ihdr(w, h, depth, color, interlace=0) -> bytes:
    return _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_rows(rows: list[bytes], filters: list[int], bpp: int) -> bytes:
    """FORWARD filtering per the spec's encoder direction."""
    out = bytearray()
    prev = bytes(len(rows[0]))
    for raw, f in zip(rows, filters):
        out.append(f)
        for i, x in enumerate(raw):
            left = raw[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - up
            elif f == 3:
                v = x - (left + up) // 2
            elif f == 4:
                v = x - _paeth(left, up, ul)
            else:  # deliberately-invalid filter byte for the error test
                out[-1] = f
                v = x
            out.append(v & 0xFF)
        prev = raw
    return bytes(out)


def _png(w, h, depth, color, rows, filters, plte=None, interlace=0,
         idat_split=None, extra_tail=b""):
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bpp = max(1, (channels * depth) // 8)
    raw = _filter_rows(rows, filters, bpp)
    comp = zlib.compress(raw)
    if idat_split:
        idats = b"".join(
            _chunk(b"IDAT", comp[i : i + idat_split])
            for i in range(0, len(comp), idat_split)
        )
    else:
        idats = _chunk(b"IDAT", comp)
    plte_chunk = _chunk(b"PLTE", bytes(plte)) if plte else b""
    return (
        PNG_MAGIC
        + _ihdr(w, h, depth, color, interlace)
        + plte_chunk
        + idats
        + _chunk(b"IEND", b"")
        + extra_tail
    )


# -------------------------------------------------------------------- goldens


def test_golden_gray_sub_up_hand_derived():
    """2x2 gray-8, row0 Sub row1 Up, filtered stream hand-derived:
    raw (10,20),(30,255) -> filtered 01 0A 0A / 02 14 EB. The 255 pixel
    forces the modular wrap (20 + 235 = 255 mod 256)."""
    filtered = bytes([1, 0x0A, 0x0A, 2, 0x14, 0xEB])
    data = (
        PNG_MAGIC
        + _ihdr(2, 2, 8, 0)
        + _chunk(b"IDAT", zlib.compress(filtered))
        + _chunk(b"IEND", b"")
    )
    img = decode_png(data)
    assert (img.width, img.height, img.bit_depth, img.color_name) == (2, 2, 8, "gray")
    assert img.raw == bytes([10, 20, 30, 255])
    assert [img.pixel(x, y) for y in (0, 1) for x in (0, 1)] == [
        (10,), (20,), (30,), (255,)
    ]


def test_all_five_filters_roundtrip_rgb():
    """5 rows x 4 px RGB-8, one row per filter type 0..4 — reconstruction
    must invert the forward filtering exactly."""
    rows = [
        bytes((r * 53 + i * 17) % 256 for i in range(12)) for r in range(5)
    ]
    img = decode_png(_png(4, 5, 8, 2, rows, [0, 1, 2, 3, 4]))
    assert img.raw == b"".join(rows)
    # spot-pin one pixel per row against the generator arithmetic
    for y in range(5):
        assert img.pixel(2, y) == tuple((y * 53 + (6 + c) * 17) % 256 for c in range(3))


def test_paeth_exercises_all_three_predictor_branches():
    """Values chosen so the Paeth predictor picks left, up, AND upper-left
    across the row (p-distance ties break left>up>ul per spec): with
    prev=[100,140,200,3], cur=[60,250,190,40] the per-byte picks are
    up (i=0), upper-left (i=1: p=60+140-100=100=c), left (i=2), up (i=3)."""
    rows = [bytes([100, 140, 200, 3]), bytes([60, 250, 190, 40])]
    img = decode_png(_png(4, 2, 8, 0, rows, [0, 4]))
    assert img.raw == b"".join(rows)


def test_rgb16_big_endian_samples():
    rows = [struct.pack(">HHH", 0x1234, 0xFFFE, 0x0001)]
    img = decode_png(_png(1, 1, 16, 2, rows, [1]))
    assert img.pixel(0, 0) == (0x1234, 0xFFFE, 0x0001)


def test_palette_4bit_odd_width_padding():
    """Width 5 at 4 bits/px -> stride 3 with 4 pad bits; indices resolve
    through PLTE."""
    plte = [255, 0, 0, 0, 255, 0, 0, 0, 255]  # red, green, blue
    # indices 0,1,2,1,0 packed MSB-first: 0x01 0x21 0x00
    rows = [bytes([0x01, 0x21, 0x00])]
    img = decode_png(_png(5, 1, 4, 3, rows, [0], plte=plte))
    assert [img.pixel(x, 0) for x in range(5)] == [
        (255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 255, 0), (255, 0, 0)
    ]


def test_gray_1bit_width9_msb_first_packing():
    # bits 101010101 -> bytes 0xAA 0x80 (7 pad bits)
    img = decode_png(_png(9, 1, 1, 0, [bytes([0xAA, 0x80])], [0]))
    assert [img.pixel(x, 0)[0] for x in range(9)] == [1, 0, 1, 0, 1, 0, 1, 0, 1]


def test_gray_alpha_and_rgba_average_filter():
    ga = decode_png(_png(2, 2, 8, 4, [bytes([7, 200, 9, 100]),
                                      bytes([50, 60, 70, 80])], [0, 3]))
    assert ga.pixel(1, 1) == (70, 80)
    rows = [bytes(range(16)), bytes(range(100, 116))]
    rgba = decode_png(_png(4, 2, 8, 6, rows, [3, 3]))
    assert rgba.raw == b"".join(rows)
    assert rgba.pixel(3, 1) == (112, 113, 114, 115)


def test_idat_split_across_chunks_concatenates():
    rows = [bytes((i * 7) % 256 for i in range(30)) for _ in range(3)]
    img = decode_png(_png(10, 3, 8, 2, rows, [2, 2, 2], idat_split=5))
    assert img.raw == b"".join(rows)


def test_parse_ihdr_header_only():
    hdr = parse_ihdr(_png(4, 5, 8, 2, [bytes(12)] * 5, [0] * 5))
    assert hdr == {
        "width": 4, "height": 5, "bit_depth": 8, "color_type": 2, "interlace": 0
    }


# ----------------------------------------------------------------- fail-loud


def _valid() -> bytes:
    return _png(2, 2, 8, 0, [bytes([1, 2]), bytes([3, 4])], [0, 0])


@pytest.mark.parametrize(
    "mutilate, msg",
    [
        (lambda d: b"NOPE" + d[4:], r"bad signature"),
        (lambda d: d[:20] + bytes([d[20] ^ 0xFF]) + d[21:], r"CRC mismatch"),
        (lambda d: d[:-8], r"truncated chunk header|overruns"),
        (lambda d: d + b"junk", r"trailing bytes after IEND"),
    ],
)
def test_structural_violations_fail_loudly(mutilate, msg):
    with pytest.raises(ValueError, match=msg):
        decode_png(mutilate(_valid()))


def test_undefined_filter_byte_fails():
    with pytest.raises(ValueError, match=r"undefined filter type 5 on row 1"):
        decode_png(_png(2, 2, 8, 0, [bytes([1, 2]), bytes([3, 4])], [0, 5]))


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_png(w, h, depth, color, rows, pass_filter=0, plte=None):
    """Adam7 FORWARD interlacer (test side): extract each pass sub-image
    from the row-major raster, filter it independently, concatenate —
    the genuine inverse of the decoder's de-interlace."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bpp = max(1, (channels * depth) // 8)

    def sample_bits(row: bytes, x: int) -> int:
        if depth >= 8:
            return None  # unused
        per = 8 // depth
        return (row[x // per] >> (8 - depth * (x % per + 1))) & ((1 << depth) - 1)

    stream = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = 0 if x0 >= w else (w - x0 + dx - 1) // dx
        ph = 0 if y0 >= h else (h - y0 + dy - 1) // dy
        if not pw or not ph:
            continue
        sub_rows = []
        for j in range(ph):
            src = rows[y0 + j * dy]
            if depth >= 8:
                px = channels * depth // 8
                line = b"".join(
                    src[(x0 + i * dx) * px : (x0 + i * dx + 1) * px]
                    for i in range(pw)
                )
            else:
                per = 8 // depth
                acc = bytearray((pw * depth + 7) // 8)
                for i in range(pw):
                    v = sample_bits(src, x0 + i * dx)
                    acc[i // per] |= v << (8 - depth * (i % per + 1))
                line = bytes(acc)
            sub_rows.append(line)
        stream += _filter_rows(sub_rows, [pass_filter] * ph, bpp)
    plte_chunk = _chunk(b"PLTE", bytes(plte)) if plte else b""
    return (
        PNG_MAGIC + _ihdr(w, h, depth, color, interlace=1) + plte_chunk
        + _chunk(b"IDAT", zlib.compress(bytes(stream))) + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("pass_filter", [0, 1, 2, 3, 4])
def test_adam7_gray8_8x8_deinterlaces_exactly(pass_filter):
    rows = [bytes(range(y * 8, y * 8 + 8)) for y in range(8)]
    img = decode_png(_adam7_png(8, 8, 8, 0, rows, pass_filter=pass_filter))
    assert img.raw == b"".join(rows)


def test_adam7_rgb_and_16bit_and_empty_passes():
    rgb = [bytes((y * 37 + i * 11) % 256 for i in range(9)) for y in range(3)]
    assert decode_png(_adam7_png(3, 3, 8, 2, rgb, pass_filter=1)).raw == b"".join(rgb)
    deep = [struct.pack(">HH", 0x1234, 0xBEEF), struct.pack(">HH", 1, 2)]
    assert decode_png(_adam7_png(2, 2, 16, 0, deep)).raw == b"".join(deep)
    # 1x1: only pass 1 exists
    assert decode_png(_adam7_png(1, 1, 8, 0, [b"\x99"])).raw == b"\x99"
    # 2x2: passes 1, 6, 7 only
    two = [bytes([1, 2]), bytes([3, 4])]
    assert decode_png(_adam7_png(2, 2, 8, 0, two)).raw == b"".join(two)


def test_adam7_subbyte_scatter():
    rows = [bytes([0b10110010]), bytes([0b01011100]), bytes([0b11100001])]
    got = decode_png(_adam7_png(8, 3, 1, 0, rows))
    assert got.raw == b"".join(rows)
    # palette 4-bit through the interlaced path
    plte = [255, 0, 0, 0, 255, 0, 0, 0, 255]
    prow = [bytes([0x01, 0x21, 0x00]), bytes([0x21, 0x00, 0x10])]
    ok = decode_png(_adam7_png(5, 2, 4, 3, prow, plte=plte))
    assert ok.raw == b"".join(prow)
    # row1 nibbles are 2,1,0,0,1 -> x=1 is palette index 1 = green
    assert ok.pixel(1, 1) == (0, 255, 0)


def test_adam7_wrong_stream_size_fails():
    # sequential-layout data under an interlace-1 header: 2x2 gray needs
    # 7 Adam7 bytes (pass1 2 + pass6 2 + pass7 3), not 6
    with pytest.raises(ValueError, match=r"inflated 6 bytes, geometry needs 7"):
        decode_png(_png(2, 2, 8, 0, [bytes([1, 2]), bytes([3, 4])], [0, 0],
                        interlace=1))


def test_illegal_depth_color_combo():
    data = PNG_MAGIC + _ihdr(1, 1, 4, 2) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match=r"bit depth 4 illegal for color type 2"):
        parse_ihdr(data)


def test_palette_without_plte_fails():
    with pytest.raises(ValueError, match=r"palette image without PLTE"):
        decode_png(_png(2, 1, 8, 3, [bytes([0, 1])], [0]))


def test_nonconsecutive_idat_fails():
    good = _png(2, 1, 8, 0, [bytes([1, 2])], [0])
    # splice a tEXt chunk between two IDAT halves
    comp = zlib.compress(bytes([0, 1, 2]))
    data = (
        PNG_MAGIC
        + _ihdr(2, 1, 8, 0)
        + _chunk(b"IDAT", comp[:4])
        + _chunk(b"tEXt", b"k\x00v")
        + _chunk(b"IDAT", comp[4:])
        + _chunk(b"IEND", b"")
    )
    assert decode_png(good)  # sanity: the unspliced form is fine
    with pytest.raises(ValueError, match=r"non-consecutive IDAT"):
        decode_png(data)


def test_inflate_size_drift_fails():
    # declare 2x2 but provide one row of pixel data
    data = (
        PNG_MAGIC
        + _ihdr(2, 2, 8, 0)
        + _chunk(b"IDAT", zlib.compress(bytes([0, 1, 2])))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match=r"inflated 3 bytes, geometry needs 6"):
        decode_png(data)


def test_decompression_bomb_rejected_at_declared_size():
    """Small declared geometry + IDAT that inflates to ~64 MB: the bounded
    inflate must reject at the declared size, never materialize the bomb."""
    bomb = zlib.compress(bytes(64 * 1024 * 1024))
    data = (
        PNG_MAGIC + _ihdr(2, 2, 8, 0) + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match=r"inflates beyond the 6 bytes"):
        decode_png(data)


def test_trailing_garbage_after_zlib_stream_fails():
    comp = zlib.compress(bytes([0, 1, 2])) + b"XX"
    data = (
        PNG_MAGIC + _ihdr(2, 1, 8, 0) + _chunk(b"IDAT", comp) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match=r"trailing bytes after the IDAT zlib"):
        decode_png(data)


def test_unterminated_zlib_stream_fails():
    comp = zlib.compress(bytes([0, 1, 2]))[:-4]  # drop the stream end
    data = (
        PNG_MAGIC + _ihdr(2, 1, 8, 0) + _chunk(b"IDAT", comp) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match=r"did not terminate|inflated"):
        decode_png(data)


def test_zero_dimension_and_unknown_color_fail():
    with pytest.raises(ValueError, match=r"zero dimension"):
        parse_ihdr(PNG_MAGIC + _ihdr(0, 1, 8, 0) + _chunk(b"IEND", b""))
    bad = _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 7, 0, 0, 0))
    with pytest.raises(ValueError, match=r"unknown color type 7"):
        parse_ihdr(PNG_MAGIC + bad + _chunk(b"IEND", b""))


# ----------------------------------------------- the multimodal real path


def test_decode_image_real_routes_png_and_refuses_others():
    from hbase_observer_es_spark.operators.multimodal import decode_image_real

    meta = decode_image_real(_png(4, 5, 8, 2, [bytes(12)] * 5, [0] * 5))
    assert meta == {
        "width": 4, "height": 5, "n_frames": 1, "fmt": "png",
        "bit_depth": 8, "color_type": 2, "channels": 3,
    }
    # a RECOGNIZED magic with corrupt bytes is corruption, not a refusal:
    # it must raise ValueError (propagates through q_mm_decode), never
    # fall back to the fake codec
    with pytest.raises(ValueError):
        decode_image_real(b"\xff\xd8\xff\xe0rest")
    # a RIFF/WEBP magic whose binary size field doesn't match the payload
    # fails the structural sniff guard → unknown → fake fallback (text
    # that happens to spell RIFF…WEBP can never crash the query)
    with pytest.raises(NotImplementedError, match=r"unknown"):
        decode_image_real(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    # a VALID lossy container refuses by name (→ fake fallback)
    vp8_body = b"\x00\x00\x00\x9d\x01\x2a\x02\x00\x02\x00"
    lossy = (b"RIFF" + (4 + 8 + len(vp8_body)).to_bytes(4, "little")
             + b"WEBPVP8 " + len(vp8_body).to_bytes(4, "little") + vp8_body)
    with pytest.raises(NotImplementedError, match=r"lossy VP8"):
        decode_image_real(lossy)
    with pytest.raises(NotImplementedError, match=r"unknown"):
        decode_image_real(b"plain text payload")


def test_decode_image_real_routes_jpeg_gif_bmp_for_real():
    """The registered dispatch now rides jpeg.decode_image: baseline JPEG,
    GIF, and BMP payloads produce REAL header geometry through
    decode_image_real, not refusals."""
    from hbase_observer_es_spark.operators.jpeg import encode_jpeg
    from hbase_observer_es_spark.operators.multimodal import decode_image_real
    from hbase_observer_es_spark.operators.png import PngImage

    gray = PngImage(8, 8, 8, 0, 1, 8, bytes(range(64)), None)
    j = decode_image_real(encode_jpeg(gray, quality=100))
    assert (j["width"], j["height"], j["fmt"]) == (8, 8, "jpeg")
    # 1x1 single-frame GIF, 2-color table, hand-packed LZW (min code 2)
    gif = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00"
        b"\x00\x00\x00\xff\xff\xff"
        b",\x00\x00\x00\x00\x01\x00\x01\x00\x00"
        b"\x02\x02\x44\x01\x00;"
    )
    g = decode_image_real(gif)
    assert (g["width"], g["height"], g["fmt"]) == (1, 1, "gif")


def test_real_decode_through_arrow_batches(spark):
    """The decoder inside the actual mapInPandas plumbing: binary payloads
    through Arrow, real IHDR geometry out."""
    import pandas as pd

    from hbase_observer_es_spark.operators.multimodal import decode_image_real

    payloads = [
        (1, _png(4, 5, 8, 2, [bytes(12)] * 5, [0] * 5)),
        (2, _png(9, 1, 1, 0, [bytes([0xAA, 0x80])], [0])),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")

    def decode(batches):
        for pdf in batches:
            meta = [decode_image_real(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "channels": [m["channels"] for m in meta],
                }
            )

    got = {
        r.doc_id: (r.width, r.height, r.channels)
        for r in df.mapInPandas(
            decode, "doc_id long, width long, height long, channels long"
        ).collect()
    }
    assert got == {1: (4, 5, 3), 2: (9, 1, 1)}


def test_fixture_payloads_cannot_carry_png_magic():
    """Structural hash-neutrality of the q_mm_decode routing: the registered
    path builds payloads as encode(text, 'UTF-8'), and the PNG signature
    byte 0x89 is not a valid UTF-8 single byte — no string column can ever
    produce it, so the fake-codec oracle remains exactly right on every
    fixture (and on ANY documents table, not just ours)."""
    with pytest.raises(UnicodeDecodeError):
        PNG_MAGIC.decode("utf-8")


# ------------------------------------------------- encoder + real resize


def _filtered_stream(data: bytes) -> bytes:
    """Inflate the IDAT stream via the PRODUCTION chunk walker (no second
    parser to drift), for filter-byte pins."""
    from hbase_observer_es_spark.operators.png import _chunks

    return zlib.decompress(
        b"".join(p for t, p in _chunks(data, "test") if t == b"IDAT")
    )


@pytest.mark.parametrize("mode", [0, 2, "adaptive"])
@pytest.mark.parametrize(
    "w,h,depth,color,rows,plte",
    [
        (4, 3, 8, 2, [bytes((r * 53 + i * 17) % 256 for i in range(12)) for r in range(3)], None),
        (3, 2, 16, 0, [struct.pack(">HHH", 1, 60000, 300), struct.pack(">HHH", 7, 8, 9)], None),
        (5, 1, 4, 3, [bytes([0x01, 0x21, 0x00])], [255, 0, 0, 0, 255, 0, 0, 0, 255]),
        (9, 2, 1, 0, [bytes([0xAA, 0x80]), bytes([0x55, 0x00])], None),
        (2, 2, 8, 6, [bytes(range(8)), bytes(range(50, 58))], None),
        (2, 1, 8, 4, [bytes([10, 20, 30, 40])], None),
    ],
)
def test_encode_decode_roundtrip_every_format(w, h, depth, color, rows, plte, mode):
    src = decode_png(_png(w, h, depth, color, rows, [0] * h, plte=plte))
    from hbase_observer_es_spark.operators.png import encode_png

    enc = encode_png(src, filter_mode=mode)
    assert enc == encode_png(src, filter_mode=mode)  # deterministic bytes
    back = decode_png(enc)
    assert back.raw == src.raw
    assert (back.width, back.height, back.bit_depth, back.color_type) == (
        w, h, depth, color
    )
    assert back.palette == src.palette


def test_adaptive_filter_picks_sub_on_horizontal_gradient():
    """A steady horizontal gradient makes Sub the constant-delta (minimum
    SAD) choice — pin the heuristic's actual decision, not just validity."""
    from hbase_observer_es_spark.operators.png import encode_png

    row = bytes(range(10, 10 + 32))  # +1 per byte
    src = decode_png(_png(32, 1, 8, 0, [row], [0]))
    assert _filtered_stream(encode_png(src, filter_mode="adaptive"))[0] == 1


def test_encode_rejects_geometry_lies_and_bad_modes():
    from hbase_observer_es_spark.operators.png import PngImage, encode_png

    good = decode_png(_png(2, 1, 8, 0, [bytes([1, 2])], [0]))
    with pytest.raises(ValueError, match=r"raw geometry mismatch"):
        encode_png(PngImage(2, 1, 8, 0, 1, 2, b"\x01\x02\x03", None))
    with pytest.raises(ValueError, match=r"filter_mode 9"):
        encode_png(good, filter_mode=9)
    with pytest.raises(ValueError, match=r"palette image without"):
        encode_png(PngImage(1, 1, 8, 3, 1, 1, b"\x00", None))
    with pytest.raises(ValueError, match=r"cannot encode zero dimension"):
        encode_png(PngImage(2, 0, 8, 0, 1, 2, b"", None))
    with pytest.raises(ValueError, match=r"cannot encode zero dimension"):
        encode_png(PngImage(0, 1, 8, 0, 1, 0, b"", None))


def test_resize_nearest_upsample_duplicates_blocks():
    from hbase_observer_es_spark.operators.png import resize_nearest

    rows = [bytes([1, 2, 3, 4, 5, 6]), bytes([7, 8, 9, 10, 11, 12])]
    src = decode_png(_png(2, 2, 8, 2, rows, [0, 0]))
    up = resize_nearest(src, 4, 4)
    for y in range(4):
        for x in range(4):
            assert up.pixel(x, y) == src.pixel(x // 2, y // 2)


def test_resize_nearest_downsample_floor_grid():
    from hbase_observer_es_spark.operators.png import resize_nearest

    rows = [bytes((y * 16 + x) for x in range(4)) for y in range(4)]
    src = decode_png(_png(4, 4, 8, 0, rows, [0] * 4))
    down = resize_nearest(src, 2, 2)
    assert [down.pixel(x, y)[0] for y in (0, 1) for x in (0, 1)] == [
        0, 2, 32, 34
    ]


def test_resize_nearest_palette_and_subbyte_and_16bit():
    from hbase_observer_es_spark.operators.png import resize_nearest

    plte = [255, 0, 0, 0, 255, 0, 0, 0, 255]
    pal = decode_png(_png(5, 1, 4, 3, [bytes([0x01, 0x21, 0x00])], [0], plte=plte))
    rp = resize_nearest(pal, 3, 1)  # sx = 0, 1, 3 -> indices 0, 1, 1
    assert rp.palette == pal.palette
    assert [rp.pixel(x, 0) for x in range(3)] == [
        (255, 0, 0), (0, 255, 0), (0, 255, 0)
    ]
    one = decode_png(_png(9, 1, 1, 0, [bytes([0xAA, 0x80])], [0]))
    r1 = resize_nearest(one, 3, 1)  # sx = 0, 3, 6 -> bits 1, 0, 1
    assert [r1.pixel(x, 0)[0] for x in range(3)] == [1, 0, 1]
    deep = decode_png(
        _png(2, 1, 16, 0, [struct.pack(">HH", 0x1234, 0xBEEF)], [0])
    )
    assert resize_nearest(deep, 1, 1).pixel(0, 0) == (0x1234,)
    with pytest.raises(ValueError, match=r"must be >= 1x1"):
        resize_nearest(deep, 0, 1)


def test_resize_identity_is_raw_identical():
    from hbase_observer_es_spark.operators.png import resize_nearest

    rows = [bytes((r * 53 + i * 17) % 256 for i in range(12)) for r in range(3)]
    src = decode_png(_png(4, 3, 8, 2, rows, [0] * 3))
    assert resize_nearest(src, 4, 3).raw == src.raw


def test_resize_image_real_end_to_end():
    """PNG in → decoded → fit-to-224 NN resample of REAL pixels → spec-valid
    PNG out; geometry and corner pixels pinned."""
    from hbase_observer_es_spark.operators.multimodal import resize_image_real

    rows = [bytes((r * 53 + i * 17) % 256 for i in range(12)) for r in range(5)]
    payload = _png(4, 5, 8, 2, rows, [0] * 5)
    m = resize_image_real(payload)
    assert (m["width"], m["height"], m["out_w"], m["out_h"]) == (4, 5, 179, 224)
    out = decode_png(m["payload"])
    assert (out.width, out.height) == (179, 224)
    src = decode_png(payload)
    # NN floor mapping: out corner pixels come from src corners
    assert out.pixel(0, 0) == src.pixel(0, 0)
    assert out.pixel(178, 223) == src.pixel((178 * 4) // 179, (223 * 5) // 224)
    # checksum contract: geometry + reconstructed scanlines, NOT the
    # compressed payload (zlib builds differ across hosts; pixels don't)
    assert m["raw_crc32"] == zlib.crc32(struct.pack(">II", 179, 224) + out.raw)
    # corrupt bytes under a recognized magic = corruption (ValueError),
    # undecodable format = refusal (NotImplementedError) — same contract
    # as decode_image_real (shared _decode_real dispatch)
    with pytest.raises(ValueError):
        resize_image_real(b"\xff\xd8\xffrest")
    vp8_body = b"\x00\x00\x00\x9d\x01\x2a\x02\x00\x02\x00"
    lossy = (b"RIFF" + (4 + 8 + len(vp8_body)).to_bytes(4, "little")
             + b"WEBPVP8 " + len(vp8_body).to_bytes(4, "little") + vp8_body)
    with pytest.raises(NotImplementedError, match=r"lossy VP8"):
        resize_image_real(lossy)


def test_resize_image_real_jpeg_in_png_out():
    """Lossy in, lossless thumbnail out: a JPEG payload resizes through the
    SAME real path and re-encodes as spec-valid PNG."""
    from hbase_observer_es_spark.operators.jpeg import encode_jpeg
    from hbase_observer_es_spark.operators.multimodal import resize_image_real
    from hbase_observer_es_spark.operators.png import PngImage

    gray = PngImage(16, 8, 8, 0, 1, 16, bytes(range(128)), None)
    m = resize_image_real(encode_jpeg(gray, quality=100))
    assert (m["width"], m["height"], m["out_w"], m["out_h"]) == (16, 8, 224, 112)
    out = decode_png(m["payload"])
    assert (out.width, out.height, out.color_type) == (224, 112, 0)


def test_plte_between_idat_runs_fails():
    """Regression: idat_done was only set in the generic elif branch, so
    a PLTE chunk spliced between two IDAT runs (spec-forbidden twice
    over) sailed through the contiguity check the error message claims
    to enforce."""
    comp = zlib.compress(bytes([0, 1, 2]))
    data = (
        PNG_MAGIC
        + _ihdr(2, 1, 8, 0)
        + _chunk(b"IDAT", comp[:4])
        + _chunk(b"PLTE", bytes([0, 0, 0]))
        + _chunk(b"IDAT", comp[4:])
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match=r"non-consecutive IDAT|PLTE after IDAT"):
        decode_png(data)


def test_plte_after_idat_fails():
    """PLTE must precede the image data (PNG chunk-ordering rules) even
    when the IDAT run itself is contiguous."""
    comp = zlib.compress(bytes([0, 1, 2]))
    data = (
        PNG_MAGIC
        + _ihdr(2, 1, 8, 0)
        + _chunk(b"IDAT", comp)
        + _chunk(b"PLTE", bytes([0, 0, 0]))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match=r"PLTE after IDAT"):
        decode_png(data)
