"""WebP lossless (VP8L) decode tests.

An INDEPENDENT test-side encoder writes VP8L bit streams from explicit
RGB pixels: canonical prefix codes via the 19-symbol code-length code,
simple 1/2-symbol codes where the alphabet allows, the four transforms
applied FORWARD (the decoder inverts), and hand-driven LZ77 / color-cache
/ meta-prefix streams built from the same writer primitives. One 1x1
stream is packed fully by hand so the writer itself is anchored.
Hypothesis drives random images x random transform stacks.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.vp8l import (
    _CLC_ORDER,
    _palette_width_bits,
    _subsample_size,
    decode_vp8l,
)

# ------------------------------------------------------------- bit writer


class _W:
    """LSB-first bit writer (the VP8L orientation)."""

    def __init__(self):
        self.bits: list = []

    def put(self, val: int, n: int) -> None:
        for i in range(n):
            self.bits.append((val >> i) & 1)

    def put_code(self, code: int, length: int) -> None:
        """Prefix codes are MSB-first on the LSB-first stream."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _canonical(lengths: dict) -> dict:
    """{sym: len} → {sym: (code, len)} via the DEFLATE algorithm."""
    live = sorted(lengths.items(), key=lambda t: (t[1], t[0]))
    codes = {}
    code = 0
    prev = live[0][1]
    for s, l in live:
        code <<= l - prev
        prev = l
        codes[s] = (code, l)
        code += 1
    return codes


def _balanced_lengths(symbols: list) -> dict:
    """Complete canonical code: m = 2^L - n symbols at L-1, rest at L."""
    n = len(symbols)
    if n == 1:
        return {symbols[0]: 0}  # 0-bit single-symbol code
    L = (n - 1).bit_length()
    m = (1 << L) - n
    out = {}
    for i, s in enumerate(sorted(symbols)):
        out[s] = L - 1 if i < m else L
    return out


class _CodeW:
    """One alphabet's writer: emits the prefix-code DEFINITION and then
    symbols. Uses the simple form for 1-2 symbols (values ≤ 255), else
    the normal form with literal code-length entries."""

    def __init__(self, w: _W, alphabet: int, symbols: list):
        self.w = w
        used = sorted(set(symbols))
        assert used, "alphabet with no symbols"
        if len(used) <= 2 and used[-1] <= 255:
            w.put(1, 1)  # simple
            w.put(len(used) - 1, 1)
            first = used[0]
            if first > 1:
                w.put(1, 1)
                w.put(first, 8)
            else:
                w.put(0, 1)
                w.put(first, 1)
            if len(used) == 2:
                w.put(used[1], 8)
            if len(used) == 1:
                self.codes = {used[0]: (0, 0)}
            else:
                self.codes = {used[0]: (0, 1), used[1]: (1, 1)}
            return
        w.put(0, 1)  # normal form
        sym_lengths = _balanced_lengths(used)
        lengths = [sym_lengths.get(s, 0) for s in range(alphabet)]
        cl_used = sorted(set(lengths))
        cl_lengths = _balanced_lengths(cl_used)
        cl_codes = _canonical({s: l for s, l in cl_lengths.items() if l}) \
            if len(cl_used) > 1 else {cl_used[0]: (0, 0)}
        w.put(19 - 4, 4)  # n_clc = 19: cover the whole permutation
        for s in _CLC_ORDER:
            w.put(cl_lengths.get(s, 0) if s in cl_lengths else 0, 3)
        w.put(0, 1)  # no max-symbol cap
        for l in lengths:
            w.put_code(*cl_codes[l])
        self.codes = _canonical({s: l for s, l in sym_lengths.items()})

    def emit(self, sym: int) -> None:
        self.w.put_code(*self.codes[sym])


def _write_image_stream(w: _W, pixels: list, cache_bits: int = 0,
                        level0: bool = False) -> None:
    """Literal-only stream for a list of ARGB pixels (no meta codes).
    Top-level streams (level0) carry the extra no-meta-prefix bit."""
    w.put(1 if cache_bits else 0, 1)
    if cache_bits:
        w.put(cache_bits, 4)
    if level0:
        w.put(0, 1)  # no meta prefix image
    greens = [(p >> 8) & 0xFF for p in pixels]
    reds = [(p >> 16) & 0xFF for p in pixels]
    blues = [p & 0xFF for p in pixels]
    alphas = [(p >> 24) & 0xFF for p in pixels]
    galpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    g = _CodeW(w, galpha, greens)
    r = _CodeW(w, 256, reds)
    b = _CodeW(w, 256, blues)
    a = _CodeW(w, 256, alphas)
    _CodeW(w, 40, [0])  # distance: unused single-symbol code
    for p in pixels:
        g.emit((p >> 8) & 0xFF)
        r.emit((p >> 16) & 0xFF)
        b.emit(p & 0xFF)
        a.emit((p >> 24) & 0xFF)


def _vp8l_header(w_px: int, h_px: int) -> _W:
    w = _W()
    w.put(w_px - 1, 14)
    w.put(h_px - 1, 14)
    w.put(0, 1)  # alpha hint
    w.put(0, 3)  # version
    return w


def _wrap(bits: _W) -> bytes:
    body = b"\x2f" + bits.bytes()
    riff = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff


def _rgb(r, g, b):
    return 0xFF000000 | (r << 16) | (g << 8) | b


def _encode_simple(width, height, pixels, transforms=()):
    """Full test-side encoder: forward-apply the requested transforms,
    then a literal-only stream. transforms ⊆ {'subtract_green',
    ('predictor', mode, bits), ('palette',)}."""
    w = _vp8l_header(width, height)
    px = list(pixels)
    cur_w = width
    for t in transforms:
        if t == "subtract_green":
            w.put(1, 1)
            w.put(2, 2)
            px = [
                (p & 0xFF00FF00)
                | ((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16
                | ((((p) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
                for p in px
            ]
        elif isinstance(t, tuple) and t[0] == "predictor":
            _, mode, bits = t
            w.put(1, 1)
            w.put(0, 2)
            w.put(bits - 2, 3)
            sw = _subsample_size(cur_w, bits)
            sh = _subsample_size(height, bits)
            _write_image_stream(w, [0xFF000000 | (mode << 8)] * (sw * sh))
            out = []
            for y in range(height):
                for x in range(cur_w):
                    i = y * cur_w + x
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = px[i - 1]
                    elif x == 0:
                        pred = px[i - cur_w]
                    elif mode == 1:
                        pred = px[i - 1]
                    elif mode == 2:
                        pred = px[i - cur_w]
                    elif mode == 3:
                        # TR: unconditional i-w+1 — for the rightmost
                        # column that IS the leftmost pixel of the
                        # current row, per the spec edge rule
                        pred = px[i - cur_w + 1]
                    else:
                        raise AssertionError(f"encoder mode {mode}")
                    out.append(_sub_px(px[i], pred))
            px = out
        elif isinstance(t, tuple) and t[0] == "palette":
            colors = sorted(set(px))
            w.put(1, 1)
            w.put(3, 2)
            w.put(len(colors) - 1, 8)
            deltas = []
            prev = 0
            for c in colors:
                deltas.append(_sub_px(c, prev))
                prev = c
            _write_image_stream(w, deltas)
            index = {c: i for i, c in enumerate(colors)}
            xbits = _palette_width_bits(len(colors))
            if xbits:
                bw = _subsample_size(cur_w, xbits)
                per = 1 << xbits
                sbits = 8 >> xbits
                bundled = []
                for y in range(height):
                    for bx in range(bw):
                        green = 0
                        for j in range(per):
                            x = bx * per + j
                            if x < cur_w:
                                green |= index[px[y * cur_w + x]] << (j * sbits)
                        bundled.append(0xFF000000 | (green << 8))
                px = bundled
                cur_w = bw
            else:
                px = [0xFF000000 | (index[p] << 8) for p in px]
    w.put(0, 1)  # end of transforms
    _write_image_stream(w, px, level0=True)
    return _wrap(w)


def _sub_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) - (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) - (b >> 8)) & 0xFF) << 8)
        | (((a - b) & 0xFF))
    )


def _raw(img) -> list:
    return [
        (img.raw[i], img.raw[i + 1], img.raw[i + 2])
        for i in range(0, len(img.raw), 3)
    ]


def _expected(pixels) -> list:
    return [((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF) for p in pixels]


# ------------------------------------------------------------------- tests


def test_handpacked_1x1_white():
    """Fully hand-packed: header (w-1=0 in 14, h-1=0 in 14, alpha 0,
    version 0), transforms end (0), no cache (0), no meta (0), then five
    SIMPLE single-symbol codes — green 255: bits 1,0,1,<255 in 8>; red,
    blue, alpha likewise; distance symbol 0: bits 1,0,0,<0 in 1>. Every
    code is 0-bit so the single pixel costs no further bits."""
    w = _W()
    w.put(0, 14)
    w.put(0, 14)
    w.put(0, 1)
    w.put(0, 3)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    for _ in range(4):  # green red blue alpha: single symbol 255
        w.put(1, 1)
        w.put(0, 1)
        w.put(1, 1)
        w.put(255, 8)
    w.put(1, 1)  # distance: single symbol 0
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    img = decode_vp8l(b"\x2f" + w.bytes())
    assert (img.width, img.height, img.color_type) == (1, 1, 2)
    assert img.raw == b"\xff\xff\xff"


def test_literals_and_container_round_trip():
    pixels = [_rgb(10, 20, 30), _rgb(200, 100, 0),
              _rgb(10, 20, 30), _rgb(0, 0, 255)]
    data = _encode_simple(2, 2, pixels)
    from hbase_observer_es_spark.operators.webpmeta import (
        decode_webp_pixels, webp_meta,
    )

    m = webp_meta(data)
    assert (m["kind"], m["width"], m["height"]) == ("lossless", 2, 2)
    img = decode_webp_pixels(data)
    assert _raw(img) == _expected(pixels)


def test_subtract_green_and_predictor_and_palette():
    pixels = [_rgb((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 91) % 256)
              for y in range(5) for x in range(7)]
    from hbase_observer_es_spark.operators.jpeg import decode_image

    for transforms in (
        ("subtract_green",),
        (("predictor", 1, 2),),
        ("subtract_green", ("predictor", 1, 3)),
    ):
        data = _encode_simple(7, 5, pixels, transforms)
        assert _raw(decode_image(data)) == _expected(pixels), transforms


def test_palette_bundling_all_widths():
    """Palette sizes 2/3/16/40: xbits 3/2/1/0 — sub-byte bundling and the
    plain indexed path."""
    from hbase_observer_es_spark.operators.jpeg import decode_image

    for ncolors in (2, 3, 16, 40):
        palette = [_rgb((i * 53) % 256, (i * 7) % 256, (i * 199) % 256)
                   for i in range(ncolors)]
        pixels = [palette[(x * 3 + y) % ncolors]
                  for y in range(4) for x in range(11)]
        data = _encode_simple(11, 4, pixels, (("palette",),))
        assert _raw(decode_image(data)) == _expected(pixels), ncolors


def test_lz77_copy_and_color_cache():
    """Hand-driven stream: literal P, then a length-3 distance-1 copy
    (green symbol 258 → length 3; distance symbol 1 → code 2 → map (1,0)
    → dist 1), then a cache hit for P."""
    P = _rgb(9, 200, 77)
    cache_bits = 4
    idx = ((0x1E35A7BD * P) & 0xFFFFFFFF) >> (32 - cache_bits)
    w = _vp8l_header(5, 1)
    w.put(0, 1)  # no transforms
    w.put(1, 1)  # cache
    w.put(cache_bits, 4)
    w.put(0, 1)  # no meta
    galpha = 256 + 24 + (1 << cache_bits)
    g = _CodeW(w, galpha, [200, 258, 280 + idx])
    r = _CodeW(w, 256, [9])
    b = _CodeW(w, 256, [77])
    a = _CodeW(w, 256, [255])
    d = _CodeW(w, 40, [1])
    g.emit(200)  # literal green
    r.emit(9)
    b.emit(77)
    a.emit(255)
    g.emit(258)  # length code 2 → 3 pixels
    d.emit(1)    # distance code 2 → (1, 0) → 1
    g.emit(280 + idx)  # cache hit
    img = decode_vp8l(b"\x2f" + w.bytes())
    assert _raw(img) == _expected([P] * 5)


def test_meta_prefix_groups():
    """8x4, meta_bits=2 → a 2x1 meta image: left block group 0 (red
    pixels), right block group 1 (blue pixels)."""
    w = _vp8l_header(8, 4)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no cache
    w.put(1, 1)  # meta prefix image
    w.put(0, 3)  # meta_bits = 2
    # meta image 2x1: pixels with (red<<8|green) = 0 and 1
    _write_image_stream(w, [0xFF000000, 0xFF000100])
    left, right = _rgb(250, 1, 2), _rgb(3, 4, 251)
    for color in (left, right):  # two groups, single-symbol codes each
        _CodeW(w, 280, [(color >> 8) & 0xFF])
        _CodeW(w, 256, [(color >> 16) & 0xFF])
        _CodeW(w, 256, [color & 0xFF])
        _CodeW(w, 256, [255])
        _CodeW(w, 40, [0])
    # every code is 0-bit: the 32 pixels cost no bits at all
    img = decode_vp8l(b"\x2f" + w.bytes())
    expect = [left if x < 4 else right for y in range(4) for x in range(8)]
    assert _raw(img) == _expected(expect)


def test_corruption_is_loud():
    pixels = [_rgb(1, 2, 3)] * 4
    data = _encode_simple(2, 2, pixels)
    with pytest.raises(ValueError, match=r"signature byte"):
        decode_vp8l(b"\x30" + data[21:])
    with pytest.raises(ValueError, match=r"exhausted"):
        decode_vp8l(b"\x2f\x00\x00\x00\x00")
    # oversubscribed code: normal form whose lengths break Kraft
    w = _vp8l_header(2, 1)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)  # normal form green code
    w.put(19 - 4, 4)
    for s in _CLC_ORDER:
        w.put(1 if s == 1 else 0, 3)  # only CL symbol 1 → every len = 1
    w.put(0, 1)
    w.put(0, 0)
    # three symbols at length 1 → oversubscribed
    with pytest.raises(ValueError, match=r"subscribed|exhausted"):
        decode_vp8l(b"\x2f" + w.bytes() + b"\x00" * 8)


def test_geometry_bomb_guard():
    w = _W()
    w.put(0x3FFF, 14)
    w.put(0x3FFF, 14)
    w.put(0, 1)
    w.put(0, 3)
    with pytest.raises(ValueError, match=r"pixel guard"):
        decode_vp8l(b"\x2f" + w.bytes() + b"\x00" * 4)


@st.composite
def _img_case(draw):
    width = draw(st.integers(1, 9))
    height = draw(st.integers(1, 6))
    nvals = draw(st.integers(1, 6))
    palette = [
        _rgb(
            draw(st.integers(0, 255)),
            draw(st.integers(0, 255)),
            draw(st.integers(0, 255)),
        )
        for _ in range(nvals)
    ]
    pixels = [
        palette[draw(st.integers(0, nvals - 1))]
        for _ in range(width * height)
    ]
    stack = draw(
        st.sampled_from(
            [
                (),
                ("subtract_green",),
                (("predictor", 1, 2),),
                (("palette",),),
                ("subtract_green", ("predictor", 1, 4)),
            ]
        )
    )
    return width, height, pixels, stack


@settings(max_examples=30, deadline=None)
@given(_img_case())
def test_round_trip_property(case):
    width, height, pixels, stack = case
    from hbase_observer_es_spark.operators.jpeg import decode_image

    data = _encode_simple(width, height, pixels, stack)
    assert _raw(decode_image(data)) == _expected(pixels)


def test_color_transform_inverse():
    """Cross-color transform: one 8x8 block with a fixed
    ColorTransformElement (green_to_red=0x40, green_to_blue=0xE8 (-24),
    red_to_blue=0x10). The encoder subtracts the signed 3.5 fixed-point
    deltas (using the FINAL red for red_to_blue, since the decoder
    reconstructs red before blue); the decoder must add them back."""
    def delta(t, c):
        st = t - 256 if t >= 128 else t
        sc = c - 256 if c >= 128 else c
        return (st * sc) >> 5

    g2r, g2b, r2b = 0x40, 0xE8, 0x10
    pixels = [_rgb((x * 31 + y * 7) % 256, (x * 13) % 256, (y * 77) % 256)
              for y in range(5) for x in range(6)]
    residual = []
    for p in pixels:
        r, g, b = (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF
        rr = (r - delta(g2r, g)) & 0xFF
        rb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
        residual.append(0xFF000000 | (rr << 16) | (g << 8) | rb)
    w = _vp8l_header(6, 5)
    w.put(1, 1)  # transform present
    w.put(1, 2)  # COLOR
    w.put(3 - 2, 3)  # bits=3: one 8x8 block covers the 6x5 image
    # spec channel layout: RED carries red_to_blue, GREEN green_to_blue,
    # BLUE green_to_red (the review caught the test and decoder agreeing
    # on the SWAPPED layout — both now match libwebp's multipliers)
    cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    _write_image_stream(w, [cte])  # 1x1 sub-image
    w.put(0, 1)  # end of transforms
    _write_image_stream(w, residual, level0=True)
    img = decode_vp8l(b"\x2f" + w.bytes())
    assert _raw(img) == _expected(pixels)


def test_predictor_tr_mode_right_edge_rule():
    """Mode 3 (top-right): the rightmost column's TR is the CURRENT row's
    leftmost pixel (the unconditional px[i-w+1] index), not a clamp to
    the top pixel — the review caught the clamp; this pins the spec
    rule through a full encode/decode round trip."""
    from hbase_observer_es_spark.operators.jpeg import decode_image

    pixels = [_rgb((x * 61 + y * 17) % 256, (y * 43) % 256, (x * 7) % 256)
              for y in range(4) for x in range(5)]
    for mode in (2, 3):
        data = _encode_simple(5, 4, pixels, (("predictor", mode, 2),))
        assert _raw(decode_image(data)) == _expected(pixels), mode
