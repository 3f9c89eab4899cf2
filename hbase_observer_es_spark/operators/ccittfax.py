"""CCITT Group 3 / Group 4 fax decode from the public ITU-T T.4 / T.6
code tables, stdlib-only.

Scanned-document corpora are full of bilevel fax-compressed TIFFs —
until r13 compressions 2/3/4 were the tiff.py refusal a paper-heavy
crawl hit first. This module decodes all three from the published
recommendations:

* **Modified Huffman** (TIFF compression 2, T.4 one-dimensional): the
  white/black run-length prefix codes — terminating codes 0..63, makeup
  codes 64..1728 per color, the shared extended makeups 1792..2560 —
  with every row starting on a byte boundary and no EOLs;
* **Group 3** (compression 3, T.4): EOL-delimited rows
  (``000000000001``, fill bits tolerated), one-dimensional by default;
  with T4Options bit 0 set, the per-row tag bit selects 1-D or 2-D
  coding and 2-D rows decode against the previous row;
* **Group 4** (compression 4, T.6): pure two-dimensional MMR against
  an imaginary all-white reference line, no EOLs (a trailing EOFB is
  ignored — the strip's declared row count is the authority).

The 2-D element coding is the spec's a0/a1/b1/b2 walk: pass mode moves
``a0`` to ``b2``; vertical modes place a changing element at
``b1 ± 3``; horizontal mode emits two explicit runs with the
line-start ``max(a0, 0)`` origin rule for the imaginary white element
before the first pixel. Extension codes (``0000001``, uncompressed
mode) refuse BY NAME — T4Options/T6Options bit 1 is checked before any
bit is read.

Rows come out as 0/1 bytes (0 = the coded "white" color); the TIFF
layer (``operators/tiff.py``) maps them through the photometric tag.
Guards per the codec family rule: run totals are validated against the
declared width, vertical moves outside the line are loud, a row that
cannot complete within ``2·width + 2`` codes is corrupt, and every
error names its row and origin.

Reference parity: none — builder-brief multimodal surface, SURVEY §2-D.
"""

from __future__ import annotations

from bisect import bisect_right

# ITU-T T.4 §2.2 run-length code tables, transcribed by hand:
# {run: bit-string}. Terminating codes 0..63 and per-color makeups
# 64..1728; _EXT_MAKEUP (T.4 §2.2.4) is color-shared for runs ≥ 1792.
_WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.4 §4.2 / T.6 two-dimensional mode codes
_MODE_CODES = {
    "1": ("v", 0), "011": ("v", 1), "000011": ("v", 2),
    "0000011": ("v", 3), "010": ("v", -1), "000010": ("v", -2),
    "0000010": ("v", -3), "001": ("h", 0), "0001": ("p", 0),
    "0000001": ("ext", 0),
}


def _decode_table(*code_maps) -> dict:
    out = {}
    for m in code_maps:
        for val, bits in m.items():
            key = (len(bits), int(bits, 2))
            assert key not in out, f"duplicate code {bits}"
            out[key] = val
    return out


_WHITE_DECODE = _decode_table(_WHITE_CODES, _EXT_MAKEUP)
_BLACK_DECODE = _decode_table(_BLACK_CODES, _EXT_MAKEUP)
_MODE_DECODE = {
    (len(b), int(b, 2)): v for b, v in _MODE_CODES.items()
}

_REVERSE_BITS = bytes(
    int(f"{i:08b}"[::-1], 2) for i in range(256)
)  # FillOrder 2: LSB-first bytes → the MSB-first the tables assume


class _FaxBits:
    """MSB-first bit reader with row-context errors."""

    __slots__ = ("data", "pos", "origin")

    def __init__(self, data: bytes, origin: str):
        self.data = data
        self.pos = 0
        self.origin = origin

    def remaining(self) -> int:
        return len(self.data) * 8 - self.pos

    def bit(self, row: int) -> int:
        if self.pos >= len(self.data) * 8:
            raise ValueError(
                f"ccitt {self.origin}: stream ends inside row {row}"
            )
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_code(r: _FaxBits, table: dict, row: int, what: str,
               max_len: int = 14):
    val = 0
    for n in range(1, max_len + 1):
        val = (val << 1) | r.bit(row)
        hit = table.get((n, val))
        if hit is not None:
            return hit
    raise ValueError(
        f"ccitt {r.origin}: no {what} code matches within {max_len} bits "
        f"at row {row} (bit {r.pos}) — corrupt stream"
    )


def _read_run(r: _FaxBits, white: bool, row: int) -> int:
    """One full run length: zero or more makeup codes (≥ 64) then a
    terminating code (< 64), per the color's T.4 table."""
    table = _WHITE_DECODE if white else _BLACK_DECODE
    total = 0
    while True:
        run = _read_code(r, table, row, "white run" if white else "black run")
        total += run
        if run < 64:
            return total


def _decode_1d_row(r: _FaxBits, width: int, row: int) -> list:
    """One MH-coded row → ascending transition positions (color changes
    measured from a white start)."""
    transitions = []
    total = 0
    white = True
    for _ in range(2 * width + 2):
        total += _read_run(r, white, row)
        if total > width:
            raise ValueError(
                f"ccitt {r.origin}: row {row} runs total {total} past the "
                f"{width}-pixel width"
            )
        white = not white
        if total == width:
            return transitions
        transitions.append(total)
    raise ValueError(
        f"ccitt {r.origin}: row {row} does not complete within "
        f"{2 * width + 2} codes — corrupt stream"
    )


def _b1_b2(ref: list, a0: int, color: int, width: int) -> tuple:
    """T.4 reference-line elements: ``b1`` is the first changing element
    of ``ref`` strictly right of ``a0`` whose run starts the color
    OPPOSITE the current one (even indices start black runs), ``b2``
    the next after it."""
    i = bisect_right(ref, a0)
    if (i & 1) != color:
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


def _decode_2d_row(r: _FaxBits, ref: list, width: int, row: int) -> list:
    """One 2-D (T.4 extended / T.6 MMR) row against the reference line's
    transition list."""
    transitions = []
    a0 = -1
    color = 0  # 0 = white
    for _ in range(2 * width + 2):
        b1, b2 = _b1_b2(ref, a0, color, width)
        kind, d = _read_code(r, _MODE_DECODE, row, "2-D mode", max_len=7)
        if kind == "ext":
            raise NotImplementedError(
                f"ccitt {r.origin}: row {row} uses an extension code "
                "(uncompressed mode) — T.4/T.6 optional modes are not "
                "implemented; T4Options/T6Options declaring them refuse "
                "up front"
            )
        if kind == "p":
            a0 = b2
        elif kind == "h":
            start = a0 if a0 > 0 else 0
            run1 = _read_run(r, color == 0, row)
            run2 = _read_run(r, color != 0, row)
            a1 = start + run1
            a2 = a1 + run2
            if a2 > width:
                raise ValueError(
                    f"ccitt {r.origin}: row {row} horizontal runs reach "
                    f"{a2}, past the {width}-pixel width"
                )
            transitions += (a1, a2)
            a0 = a2
        else:  # vertical
            a1 = b1 + d
            # changing elements are STRICTLY ordered along the line
            # (T.4 §4.2.1.3.1: a1 is to the RIGHT of a0): a1 may not
            # leave the line, equal or run behind an earlier element, or
            # — after a pass advanced a0 beyond the last recorded
            # element — land back inside the passed span. Equality is
            # rejected too (a zero-advance vertical move encodes a
            # zero-length run no conforming encoder emits)
            if (
                a1 < 0 or a1 > width
                or (transitions and a1 <= transitions[-1])
                or (a0 >= 0 and a1 <= a0)
            ):
                raise ValueError(
                    f"ccitt {r.origin}: row {row} vertical move to {a1} "
                    "leaves the line or runs backwards"
                )
            transitions.append(a1)
            a0 = a1
            color ^= 1
        if a0 >= width:
            return transitions
    raise ValueError(
        f"ccitt {r.origin}: row {row} does not complete within "
        f"{2 * width + 2} modes — corrupt stream"
    )


def _consume_eol(r: _FaxBits, row: int) -> None:
    """Fill bits (zeros) then the 11-zeros-and-a-one EOL."""
    zeros = 0
    while True:
        if r.bit(row):
            break
        zeros += 1
        if zeros > 64 + 11:
            raise ValueError(
                f"ccitt {r.origin}: more than 64 fill bits before row "
                f"{row}'s EOL — corrupt stream"
            )
    if zeros < 11:
        raise ValueError(
            f"ccitt {r.origin}: expected an EOL before row {row}, found "
            f"a 1 after {zeros} zeros (bit {r.pos})"
        )


def _materialize(transitions: list, width: int, out: bytearray, base: int) -> None:
    for i in range(0, len(transitions), 2):
        s = transitions[i]
        e = transitions[i + 1] if i + 1 < len(transitions) else width
        out[base + s : base + e] = b"\x01" * (e - s)


def decode_ccitt(
    data: bytes,
    width: int,
    rows: int,
    mode: str,
    origin: str = "<bytes>",
    fill_order: int = 1,
    strip: int = 0,
) -> bytes:
    """One fax-coded strip → ``width·rows`` bytes of 0 (white) / 1
    (black). ``mode``: ``"mh"`` (compression 2 — byte-aligned MH rows),
    ``"g3"`` (T.4 1-D, EOL before every row), ``"g3-2d"`` (T.4 with the
    per-row tag bit), ``"g4"`` (T.6 MMR)."""
    if mode not in ("mh", "g3", "g3-2d", "g4"):
        raise ValueError(f"ccitt {origin}: unknown mode {mode!r}")
    if width < 1 or rows < 1:
        raise ValueError(f"ccitt {origin}: geometry {width}x{rows} invalid")
    if fill_order == 2:
        data = data.translate(_REVERSE_BITS)
    elif fill_order != 1:
        raise ValueError(f"ccitt {origin}: FillOrder {fill_order} invalid")
    r = _FaxBits(data, f"{origin} strip {strip}")
    out = bytearray(width * rows)
    ref: list = []  # imaginary all-white line above the strip
    for row in range(rows):
        if mode == "mh":
            r.align()
            cur = _decode_1d_row(r, width, row)
        elif mode == "g4":
            cur = _decode_2d_row(r, ref, width, row)
        else:
            _consume_eol(r, row)
            if mode == "g3-2d":
                one_d = r.bit(row)
                cur = (
                    _decode_1d_row(r, width, row)
                    if one_d
                    else _decode_2d_row(r, ref, width, row)
                )
            else:
                cur = _decode_1d_row(r, width, row)
        _materialize(cur, width, out, row * width)
        ref = cur
    return bytes(out)
