"""CCITT T.4/T.6 fax decode: hand-assembled bit-stream goldens (codes
transcribed inline, independently of the module tables), a test-side
encoder for all four modes driving hypothesis round trips, table
hygiene checks, loud-guard cases, and the TIFF container integration
through decode_tiff and the universal image dispatch."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.ccittfax import (
    _BLACK_CODES,
    _EXT_MAKEUP,
    _WHITE_CODES,
    decode_ccitt,
)
from hbase_observer_es_spark.operators.tiff import decode_tiff, tiff_meta


# ----------------------------------------------------------- bit helpers

def _packbits(s: str) -> bytes:
    """'0'/'1' string → bytes, MSB-first, zero-padded."""
    s = s.replace(" ", "")
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


EOL = "000000000001"


# ------------------------------------------------ hand-assembled goldens

def test_mh_golden_two_rows_byte_aligned():
    """Compression-2 rows: codes written from the published T.4 table
    BY HAND here — white 4 = 1011, black 2 = 11, white 2 = 0111;
    row 2 starts black so it opens with white 0 = 00110101, black 8 =
    000101. Rows are byte-aligned."""
    stream = _packbits("1011 11 0111") + _packbits("00110101 000101")
    out = decode_ccitt(stream, 8, 2, "mh")
    assert out == bytes([0, 0, 0, 0, 1, 1, 0, 0] + [1] * 8)


def test_g3_1d_golden_with_fill_bits():
    """T.4 1-D: EOL before every row; the second EOL carries fill
    zeros (T4Options bit 2 writers byte-align them)."""
    stream = _packbits(
        EOL + "1011 11 0111" + "0000" + EOL + "00110101 000101"
    )
    out = decode_ccitt(stream, 8, 2, "g3")
    assert out == bytes([0, 0, 0, 0, 1, 1, 0, 0] + [1] * 8)


def test_g4_golden_horizontal_then_vertical():
    """T.6 row 1 against the imaginary white line: horizontal mode
    (001) + white 4 (1011) + black 4 (011); row 2 shifts the edge
    right one with VR1 (011) and closes with V0 (1)."""
    stream = _packbits("001 1011 011" + "011 1")
    out = decode_ccitt(stream, 8, 2, "g4")
    assert out == bytes([0, 0, 0, 0, 1, 1, 1, 1] + [0, 0, 0, 0, 0, 1, 1, 1])


def test_g4_golden_pass_mode():
    """Row 1: 2W 2B 4W (horizontal + V0); row 2 all white — the black
    run vanishes via PASS (0001) then V0 closes at the width."""
    stream = _packbits("001 0111 11 1" + "0001 1")
    out = decode_ccitt(stream, 8, 2, "g4")
    assert out == bytes([0, 0, 1, 1, 0, 0, 0, 0] + [0] * 8)


def test_g3_2d_tag_bits():
    """T4Options bit 0: each EOL is followed by a tag bit — 1 selects a
    1-D row, 0 a 2-D row against the previous line."""
    stream = _packbits(EOL + "1" + "1011 011" + EOL + "0" + "011 1")
    out = decode_ccitt(stream, 8, 2, "g3-2d")
    assert out == bytes([0, 0, 0, 0, 1, 1, 1, 1] + [0, 0, 0, 0, 0, 1, 1, 1])


def test_fill_order_2_reverses_bits():
    data = _packbits("1011 11 0111")
    flipped = bytes(int(f"{b:08b}"[::-1], 2) for b in data)
    assert decode_ccitt(flipped, 8, 1, "mh", fill_order=2) == bytes(
        [0, 0, 0, 0, 1, 1, 0, 0])


# ----------------------------------------------------------- table hygiene

def _prefix_free(codes: list) -> None:
    for a in codes:
        for b in codes:
            if a is not b:
                assert not b.startswith(a), f"{a} prefixes {b}"


def test_tables_are_prefix_free_and_complete():
    whites = list(_WHITE_CODES.values()) + list(_EXT_MAKEUP.values()) + [EOL]
    blacks = list(_BLACK_CODES.values()) + list(_EXT_MAKEUP.values()) + [EOL]
    _prefix_free(whites)
    _prefix_free(blacks)
    assert len(_WHITE_CODES) == 91 and len(_BLACK_CODES) == 91
    assert len(_EXT_MAKEUP) == 13
    assert sorted(_WHITE_CODES) == sorted(_BLACK_CODES) == (
        list(range(64)) + [64 * k for k in range(1, 28)])
    assert sorted(_EXT_MAKEUP) == [1792 + 64 * k for k in range(13)]


# -------------------------------------------------- test-side fax encoder

class _BW:
    def __init__(self):
        self.s = []

    def code(self, bits: str) -> None:
        self.s.append(bits)

    def align(self) -> None:
        n = len("".join(self.s)) % 8
        if n:
            self.s.append("0" * (8 - n))

    def tobytes(self) -> bytes:
        return _packbits("".join(self.s))


def _enc_run(bw: _BW, run: int, white: bool) -> None:
    table = _WHITE_CODES if white else _BLACK_CODES
    while run > 2623:
        bw.code(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        bw.code(table[m] if m <= 1728 else _EXT_MAKEUP[m])
        run -= m
    bw.code(table[run])


def _transitions(row: list) -> list:
    out = []
    prev = 0
    for i, v in enumerate(row):
        if v != prev:
            out.append(i)
            prev = v
    return out


def _enc_1d(bw: _BW, row: list) -> None:
    tr = _transitions(row) + [len(row)]
    prev = 0
    white = True
    for t in tr:
        _enc_run(bw, t - prev, white)
        prev = t
        white = not white


def _enc_2d(bw: _BW, cur: list, ref: list, width: int) -> None:
    from bisect import bisect_right

    a0 = -1
    color = 0
    while a0 < width:
        nxt = [t for t in cur if t > a0]
        a1 = nxt[0] if nxt else width
        a2 = nxt[1] if len(nxt) > 1 else width
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        if b2 < a1:
            bw.code("0001")  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.code({0: "1", 1: "011", 2: "000011", 3: "0000011",
                     -1: "010", -2: "000010", -3: "0000010"}[a1 - b1])
            a0 = a1
            color ^= 1
        else:
            bw.code("001")  # horizontal
            start = a0 if a0 > 0 else 0
            _enc_run(bw, a1 - start, color == 0)
            _enc_run(bw, a2 - a1, color != 0)
            a0 = a2


def _encode(rows: list, width: int, mode: str) -> bytes:
    bw = _BW()
    ref: list = []
    for r_i, row in enumerate(rows):
        cur = _transitions(row)
        if mode == "mh":
            bw.align()
            _enc_1d(bw, row)
        elif mode == "g3":
            bw.code(EOL)
            _enc_1d(bw, row)
        elif mode == "g3-2d":
            bw.code(EOL)
            if r_i == 0:
                bw.code("1")
                _enc_1d(bw, row)
            else:
                bw.code("0")
                _enc_2d(bw, cur, ref, width)
        else:
            _enc_2d(bw, cur, ref, width)
        ref = cur
    return bw.tobytes()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 8),
    mode=st.sampled_from(["mh", "g3", "g3-2d", "g4"]),
    seed=st.integers(0, 1 << 30),
)
def test_round_trip_property(w, h, mode, seed):
    import random

    rng = random.Random(seed)
    rows = [
        [rng.randrange(2) for _ in range(w)] for _ in range(h)
    ]
    data = _encode(rows, w, mode)
    out = decode_ccitt(data, w, h, mode)
    assert list(out) == [v for row in rows for v in row]


def test_long_runs_exercise_makeup_codes():
    """A 3000-pixel line forces extended makeups (2560 + 384 + term)."""
    row = [0] * 2700 + [1] * 300
    data = _encode([row], 3000, "mh")
    assert list(decode_ccitt(data, 3000, 1, "mh")) == row


# ------------------------------------------------------------ loud guards

def test_guards_are_loud():
    with pytest.raises(ValueError, match=r"unknown mode"):
        decode_ccitt(b"\x00", 4, 1, "g5")
    with pytest.raises(ValueError, match=r"stream ends inside row 0"):
        decode_ccitt(b"", 8, 1, "mh")
    with pytest.raises(ValueError, match=r"expected an EOL before row 0"):
        decode_ccitt(_packbits("1011 11 0111"), 8, 1, "g3")
    # white 5 + black 8 = 13 > width 8
    with pytest.raises(ValueError, match=r"past the 8-pixel width"):
        decode_ccitt(_packbits("1100 000101 0111"), 8, 1, "mh")
    # G4 VL1 at line start would place a transition at -1
    with pytest.raises(ValueError, match=r"no 2-D mode code matches|leaves the line"):
        decode_ccitt(_packbits("0000000000000000"), 8, 1, "g4")
    with pytest.raises(NotImplementedError, match=r"extension code"):
        decode_ccitt(_packbits("0000001" + "111"), 8, 1, "g4")
    with pytest.raises(ValueError, match=r"FillOrder 3 invalid"):
        decode_ccitt(b"\x00", 4, 1, "mh", fill_order=3)


def test_zero_advance_vertical_refuses():
    """Changing elements are STRICTLY ordered (T.4 §4.2.1.3.1): a
    vertical move landing exactly ON the previous element (a1 == a0,
    a zero-length run) must refuse, not decode. Row 1 is the pass-mode
    golden's 2W 2B 4W → ref transitions [2, 4, 8]; row 2 places V0 at
    2 then VL2 from b1=4 lands BACK at 2 — zero advance."""
    with pytest.raises(ValueError, match=r"row 1 vertical move to 2 .*backwards"):
        decode_ccitt(_packbits("001 0111 11 1" + "1 000010"), 8, 2, "g4")


# ----------------------------------------------------- TIFF integration

def _entry(endian, tag, typ, count, value4: bytes) -> bytes:
    return struct.pack(endian + "HHI", tag, typ, count) + value4.ljust(4, b"\x00")


def _fax_tiff(strips: list, w, h, compression, photometric=0,
              rows_per_strip=None, t4opts=None, t6opts=None,
              fill_order=None, endian="<") -> bytes:
    """Minimal bilevel fax TIFF: per-strip payloads then one IFD."""
    rps = rows_per_strip or h
    header = (b"II*\x00" if endian == "<" else b"MM\x00*")
    pos = 8
    offs, cnts, payload = [], [], b""
    for s in strips:
        offs.append(pos)
        cnts.append(len(s))
        payload += s
        pos += len(s)
    ifd_at = pos
    header += struct.pack(endian + "I", ifd_at)

    def short(tag, v):
        return _entry(endian, tag, 3, 1, struct.pack(endian + "H", v))

    def longs(tag, vals, at):
        if len(vals) == 1:
            return _entry(endian, tag, 4, 1, struct.pack(endian + "I", vals[0])), b""
        blob = struct.pack(f"{endian}{len(vals)}I", *vals)
        return _entry(endian, tag, 4, len(vals), struct.pack(endian + "I", at)), blob

    # strip arrays (when >1) live after the IFD
    n_entries = 9 + (1 if t4opts is not None else 0) \
        + (1 if t6opts is not None else 0) + (1 if fill_order else 0)
    arrays_at = ifd_at + 2 + n_entries * 12 + 4
    e_off, blob_off = longs(273, offs, arrays_at)
    e_cnt, blob_cnt = longs(279, cnts, arrays_at + len(blob_off))
    entries = [
        short(256, w), short(257, h), short(258, 1),
        short(259, compression), short(262, photometric),
        e_off, short(277, 1),
        _entry(endian, 278, 4, 1, struct.pack(endian + "I", rps)),
        e_cnt,
    ]
    if fill_order:
        entries.append(short(266, fill_order))
    if t4opts is not None:
        entries.append(_entry(endian, 292, 4, 1, struct.pack(endian + "I", t4opts)))
    if t6opts is not None:
        entries.append(_entry(endian, 293, 4, 1, struct.pack(endian + "I", t6opts)))
    entries.sort(key=lambda e: struct.unpack(endian + "H", e[:2])[0])
    ifd = struct.pack(endian + "H", len(entries)) + b"".join(entries)
    ifd += struct.pack(endian + "I", 0)
    return header + payload + ifd + blob_off + blob_cnt


_ROWS = [
    [0, 0, 0, 0, 1, 1, 1, 1],
    [0, 0, 0, 0, 0, 1, 1, 1],
    [1, 1, 0, 0, 0, 0, 1, 1],
    [1, 1, 1, 1, 1, 1, 1, 1],
]


def _gray(rows, photometric=0):
    m = {0: 255, 1: 0} if photometric == 0 else {0: 0, 1: 255}
    return bytes(m[v] for row in rows for v in row)


def test_tiff_g4_decode_and_meta():
    data = _fax_tiff([_encode(_ROWS, 8, "g4")], 8, 4, 4)
    m = tiff_meta(data)
    assert (m["compression"], m["bits_per_sample"]) == ("ccitt-g4-fax", 1)
    img = decode_tiff(data)
    assert (img.width, img.height, img.color_type) == (8, 4, 0)
    assert img.raw == _gray(_ROWS)


def test_tiff_g3_variants_and_polarity():
    d1 = _fax_tiff([_encode(_ROWS, 8, "g3")], 8, 4, 3)
    assert decode_tiff(d1).raw == _gray(_ROWS)
    d2 = _fax_tiff([_encode(_ROWS, 8, "g3-2d")], 8, 4, 3, t4opts=1)
    assert decode_tiff(d2).raw == _gray(_ROWS)
    inv = _fax_tiff([_encode(_ROWS, 8, "g3")], 8, 4, 3, photometric=1)
    assert decode_tiff(inv).raw == _gray(_ROWS, photometric=1)


def test_tiff_mh_multistrip_resets_reference():
    """Two strips of two rows each — each strip decodes independently
    (G4's reference line must reset per strip too)."""
    s1 = _encode(_ROWS[:2], 8, "mh")
    s2 = _encode(_ROWS[2:], 8, "mh")
    data = _fax_tiff([s1, s2], 8, 4, 2, rows_per_strip=2)
    assert decode_tiff(data).raw == _gray(_ROWS)
    g1 = _encode(_ROWS[:2], 8, "g4")
    g2 = _encode(_ROWS[2:], 8, "g4")
    data4 = _fax_tiff([g1, g2], 8, 4, 4, rows_per_strip=2)
    assert decode_tiff(data4).raw == _gray(_ROWS)


def test_tiff_fill_order_2():
    raw = _encode(_ROWS, 8, "g4")
    flipped = bytes(int(f"{b:08b}"[::-1], 2) for b in raw)
    data = _fax_tiff([flipped], 8, 4, 4, fill_order=2)
    assert decode_tiff(data).raw == _gray(_ROWS)


def test_tiff_uncompressed_mode_refuses_up_front():
    data3 = _fax_tiff([b"\x00"], 8, 4, 3, t4opts=2)
    with pytest.raises(NotImplementedError, match=r"T4Options declares UNCOMPRESSED"):
        decode_tiff(data3)
    data4 = _fax_tiff([b"\x00"], 8, 4, 4, t6opts=2)
    with pytest.raises(NotImplementedError, match=r"T6Options declares UNCOMPRESSED"):
        decode_tiff(data4)


def test_tiff_fax_requires_bilevel():
    data = _fax_tiff([_encode(_ROWS, 8, "g4")], 8, 4, 4)
    # patch bits/sample (tag 258) to 8: CCITT with 8 bits is malformed
    i = data.find(struct.pack("<HH", 258, 3))
    bad = data[: i + 8] + struct.pack("<H", 8) + data[i + 10 :]
    with pytest.raises(ValueError, match=r"requires 1 bit/sample"):
        decode_tiff(bad)


def test_fax_through_universal_dispatch():
    from hbase_observer_es_spark.operators.jpeg import decode_image, sniff_format

    data = _fax_tiff([_encode(_ROWS, 8, "g4")], 8, 4, 4)
    assert sniff_format(data) == "tiff"
    assert decode_image(data).raw == _gray(_ROWS)
