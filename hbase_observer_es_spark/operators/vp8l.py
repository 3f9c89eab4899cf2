"""WebP lossless (VP8L) pixel decode from the public bitstream spec.

Closes the larger half of the "webp pixels refused" hole: VP8L is a
fully-specified lossless format (the "WebP Lossless Bitstream
Specification") built from canonical prefix codes, LZ77 over pixels with
a 2-D close-neighborhood distance mapping, an optional color cache, and
four invertible transforms — all integer, all stdlib-expressible, unlike
the lossy VP8 half (boolean arithmetic coder + loop filter) which stays
a named refusal. Implemented here, from the spec:

* LSB-first bit reader over the VP8L chunk body; 5-byte header
  (signature 0x2F, 14-bit minus-one geometry, alpha hint, version 0);
* canonical prefix codes: the 1/2-symbol "simple" form (POSITIONAL code
  assignment — first-read symbol takes bit 0), and the "normal" form
  with the 19-entry code-length code in the spec's permutation order,
  16/17/18 repeat symbols, the optional max-symbol cap, and a Kraft
  completeness check (over- or under-subscribed codes are corruption);
* entropy-coded ARGB: green/length/cache alphabet (256+24+cache), red,
  blue, alpha, and 40-code distance alphabets; LZ77 lengths and
  distances through the shared prefix-value decode; distance codes
  1..120 through the 2-D neighborhood map, >120 raw; color cache with
  the spec's 0x1e35a7bd multiplicative hash; optional meta prefix-code
  image selecting per-block code groups (top level only);
* transforms, inverse-applied in reverse read order: PREDICTOR (all 14
  modes incl. Select and the clamped add/subtract pair, with the spec's
  edge rules), COLOR (signed 3.5 fixed-point cross-color deltas),
  SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded palette read as a
  sub-image, with sub-byte index bundling for palettes of ≤16 colors);
* sub-resolution images (entropy / predictor / color / palette) decode
  through the same image-stream machinery, transforms and meta codes
  excluded below the top level, per the spec.

Alpha is decoded and then dropped at the PngImage boundary — the corpus
convention (`tiff.py` RGB(A), the perceptual-hash inputs). Fail-loud
discipline as everywhere: header geometry is attacker data (the shared
64M-pixel guard), bit exhaustion, bad signatures, over-subscribed codes,
out-of-range palette indices, and LZ77 references before the first pixel
all name their origin.

Reference parity: none — builder-brief multimodal surface (SURVEY §2-D).
"""

from __future__ import annotations

from .png import MAX_PIXELS as _MAX_PIXELS  # one shared geometry guard

# code-length-code read order (spec: kCodeLengthCodeOrder)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2-D distance map for distance codes 1..120 (spec table, (xoffset, yoffset))
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (2, 7), (-2, 7), (7, 1), (-7, 1), (3, 7), (-3, 7), (7, 2), (-7, 2),
    (5, 5), (-5, 5), (8, 0), (0, 8), (1, 8), (-1, 8), (8, 1), (-8, 1),
    (7, 3), (-7, 3), (4, 7), (-4, 7), (8, 2), (-8, 2), (6, 5), (-6, 5),
    (7, 4), (-7, 4), (5, 6), (-5, 6), (8, 3), (-8, 3), (9, 0), (0, 9),
    (6, 6), (-6, 6), (2, 8), (-2, 8), (8, 4), (-8, 4), (9, 1), (-9, 1),
    (1, 9), (-1, 9),
)

_PREDICTOR, _COLOR, _SUBTRACT_GREEN, _COLOR_INDEXING = 0, 1, 2, 3


class _Bits:
    """LSB-first bit reader (the DEFLATE orientation) with loud exhaustion."""

    def __init__(self, data: bytes, origin: str):
        self.d = data
        self.pos = 0
        self.n = len(data) * 8
        self.origin = origin

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError(
                f"vp8l {self.origin}: bit stream exhausted mid-decode"
            )
        b = (self.d[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, k: int) -> int:
        v = 0
        for i in range(k):
            v |= self.bit() << i
        return v


class _Prefix:
    """Canonical prefix decoder. ``pairs`` is [(symbol, length)] with the
    DEFLATE canonical assignment UNLESS explicit codes are given (the
    simple form assigns positionally). Codes arrive MSB-first on the
    LSB-first bit stream, so the per-bit walk is code=(code<<1)|bit."""

    def __init__(self, pairs: list, origin: str, what: str,
                 explicit: dict | None = None):
        live = [(s, l) for s, l in pairs if l > 0]
        if not live:
            raise ValueError(f"vp8l {origin}: {what} prefix code is empty")
        if len(live) == 1:
            self.single = live[0][0]
            return
        self.single = None
        self.by_len: dict = {}
        if explicit is not None:
            for s, l in live:
                self.by_len.setdefault(l, {})[explicit[s]] = s
        else:
            maxlen = max(l for _, l in live)
            if maxlen > 15:
                raise ValueError(
                    f"vp8l {origin}: {what} code length {maxlen} > 15"
                )
            live.sort(key=lambda t: (t[1], t[0]))
            code = 0
            prev_len = live[0][1]
            for s, l in live:
                code <<= l - prev_len
                prev_len = l
                self.by_len.setdefault(l, {})[code] = s
                code += 1
        # Kraft completeness: an over/under-subscribed code is corruption
        maxlen = max(self.by_len)
        kraft = sum(
            len(codes) << (maxlen - l) for l, codes in self.by_len.items()
        )
        if kraft != (1 << maxlen):
            raise ValueError(
                f"vp8l {origin}: {what} prefix code is "
                f"{'over' if kraft > (1 << maxlen) else 'under'}-subscribed"
            )
        self.origin, self.what = origin, what

    def read(self, r: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, 16):
            code = (code << 1) | r.bit()
            got = self.by_len.get(l, {}).get(code)
            if got is not None:
                return got
        raise ValueError(
            f"vp8l {self.origin}: invalid {self.what} prefix code"
        )


def _read_prefix_code(r: _Bits, alphabet: int, origin: str, what: str) -> _Prefix:
    if r.bit():  # simple form: 1 or 2 symbols, POSITIONAL codes
        nsym = r.bit() + 1
        s0 = r.bits(8) if r.bit() else r.bit()
        if nsym == 1:
            if s0 >= alphabet:
                raise ValueError(
                    f"vp8l {origin}: {what} simple code symbol {s0} "
                    f"outside the {alphabet}-symbol alphabet"
                )
            return _Prefix([(s0, 1)], origin, what)  # 0-bit single
        s1 = r.bits(8)
        if s0 == s1:
            raise ValueError(
                f"vp8l {origin}: {what} simple code repeats symbol {s0}"
            )
        if s0 >= alphabet or s1 >= alphabet:
            raise ValueError(
                f"vp8l {origin}: {what} simple code symbol "
                f"{max(s0, s1)} outside the {alphabet}-symbol alphabet"
            )
        return _Prefix([(s0, 1), (s1, 1)], origin, what,
                       explicit={s0: 0, s1: 1})
    # normal form: code lengths via the code-length code
    n_clc = 4 + r.bits(4)
    clc_len = [0] * 19
    for i in range(n_clc):
        clc_len[_CLC_ORDER[i]] = r.bits(3)
    clc = _Prefix(list(enumerate(clc_len)), origin, f"{what} code-length")
    lengths = [0] * alphabet
    if r.bit():  # optional cap on coded symbols
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet
    sym = 0
    prev_len = 8
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = clc.read(r)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + r.bits(2)
            if sym + rep > alphabet:
                raise ValueError(
                    f"vp8l {origin}: {what} code-length repeat overruns "
                    "the alphabet"
                )
            for _ in range(rep):
                lengths[sym] = prev_len
                sym += 1
        elif cl == 17:
            sym += 3 + r.bits(3)
        else:  # 18
            sym += 11 + r.bits(7)
        if sym > alphabet:
            raise ValueError(
                f"vp8l {origin}: {what} zero-run overruns the alphabet"
            )
    return _Prefix(list(enumerate(lengths)), origin, what)


def _lz77_value(code: int, r: _Bits) -> int:
    """Shared LZ77 length/distance prefix-value decode (spec 4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.bits(extra) + 1


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_groups(r: _Bits, w: int, h: int, level0: bool, origin: str):
    """Color cache + (top level) meta prefix image + prefix-code groups.
    Returns (cache_bits, meta, meta_bits, groups)."""
    cache_bits = 0
    if r.bit():
        cache_bits = r.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(
                f"vp8l {origin}: color cache bits {cache_bits} outside 1..11"
            )
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and r.bit():
        meta_bits = 2 + r.bits(3)
        mw, mh = _subsample_size(w, meta_bits), _subsample_size(h, meta_bits)
        meta = _decode_image_stream(r, mw, mh, False, origin)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1
    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for g in range(n_groups):
        groups.append((
            _read_prefix_code(r, green_alpha, origin, f"group{g} green"),
            _read_prefix_code(r, 256, origin, f"group{g} red"),
            _read_prefix_code(r, 256, origin, f"group{g} blue"),
            _read_prefix_code(r, 256, origin, f"group{g} alpha"),
            _read_prefix_code(r, 40, origin, f"group{g} distance"),
        ))
    return cache_bits, meta, meta_bits, groups


def _decode_image_stream(r: _Bits, w: int, h: int, level0: bool,
                         origin: str) -> list:
    """One entropy-coded ARGB image (spec 5): returns w*h ints. Transforms
    are handled by the caller (top level only)."""
    cache_bits, meta, meta_bits, groups = _read_groups(r, w, h, level0, origin)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = w * h
    out = [0] * n
    i = 0
    group = groups[0]
    mw = _subsample_size(w, meta_bits) if meta is not None else 0
    while i < n:
        if meta is not None:
            x, y = i % w, i // w
            mp = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            group = groups[(mp >> 8) & 0xFFFF]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.read(r)
        if s < 256:  # literal: green, red, blue, alpha in that read order
            green = s
            red = r_code.read(r)
            blue = b_code.read(r)
            alpha = a_code.read(r)
            px = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[i] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            i += 1
        elif s < 280:  # LZ77 backward reference
            length = _lz77_value(s - 256, r)
            dcode = _lz77_value(d_code.read(r), r)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > i:
                raise ValueError(
                    f"vp8l {origin}: LZ77 distance {dist} reaches before "
                    f"the first pixel (at pixel {i})"
                )
            if i + length > n:
                raise ValueError(
                    f"vp8l {origin}: LZ77 copy of {length} overruns the "
                    f"{n}-pixel image"
                )
            for _ in range(length):
                px = out[i - dist]
                out[i] = px
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
                i += 1
        else:  # color cache hit
            if cache is None:
                raise ValueError(
                    f"vp8l {origin}: cache symbol {s} without a color cache"
                )
            out[i] = cache[s - 280]
            i += 1
    return out


# ------------------------------------------------------------- transforms


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) >> 1)
    )


def _select(l: int, t: int, tl: int) -> int:
    pl = pt = 0
    for sh in (24, 16, 8, 0):
        cl, ct, ctl = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        p = cl + ct - ctl
        pl += abs(p - cl)
        pt += abs(p - ct)
    return l if pl < pt else t  # ties go to TOP, per the spec


def _clamp_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_half(avg: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (avg >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        # C truncating division (toward zero), d may be negative
        half = d // 2 if d >= 0 else -((-d) // 2)
        v = a + half
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int, origin: str) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_full(l, t, tl)
    if mode == 13:
        return _clamp_half(_avg2(l, t), tl)
    raise ValueError(f"vp8l {origin}: predictor mode {mode} outside 0..13")


def _add_px(a: int, b: int) -> int:
    """Per-channel modular addition of two ARGB pixels."""
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
        | (((a + b) & 0xFF))
    )


def _inv_predictor(px: list, w: int, h: int, sub: list, bits: int,
                   origin: str) -> None:
    sw = _subsample_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]  # top row: left
            elif x == 0:
                pred = px[i - w]  # left column: top
            else:
                mode = (sub[(y >> bits) * sw + (x >> bits)] >> 8) & 0xFF
                l = px[i - 1]
                t = px[i - w]
                tl = px[i - w - 1]
                # TR of the rightmost column is px[i-w+1] TOO — the spec
                # defines it as the leftmost pixel of the CURRENT row,
                # which is exactly where the unconditional index lands
                tr = px[i - w + 1]
                pred = _predict(mode, l, t, tr, tl, origin)
            px[i] = _add_px(px[i], pred)


def _ct_delta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point cross-color delta: (int8(t) * int8(c)) >> 5
    with C arithmetic-shift semantics (Python >> on negatives matches)."""
    st = t - 256 if t >= 128 else t
    sc = c - 256 if c >= 128 else c
    return (st * sc) >> 5


def _inv_color_transform(px: list, w: int, h: int, sub: list, bits: int) -> None:
    sw = _subsample_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            cte = sub[(y >> bits) * sw + (x >> bits)]
            # ColorTransformElement channel layout (spec 4.4.2):
            # blue channel (bits 0-7) = green_to_red, green channel =
            # green_to_blue, RED channel (bits 16-23) = red_to_blue
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            p = px[i]
            a = (p >> 24) & 0xFF
            r = (p >> 16) & 0xFF
            g = (p >> 8) & 0xFF
            b = p & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            px[i] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(px: list) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3
    if size <= 4:
        return 2
    if size <= 16:
        return 1
    return 0


def _inv_color_indexing(px: list, w: int, h: int, palette: list,
                        xbits: int, origin: str) -> list:
    """Unbundle sub-byte indices (if any) and map through the palette."""
    out = [0] * (w * h)
    bw = _subsample_size(w, xbits) if xbits else w
    per = 1 << xbits
    sample_bits = 8 >> xbits
    mask = (1 << sample_bits) - 1
    for y in range(h):
        for x in range(w):
            if xbits:
                bundled = px[y * bw + (x >> xbits)]
                idx = ((bundled >> 8) >> ((x % per) * sample_bits)) & mask
            else:
                idx = (px[y * w + x] >> 8) & 0xFF
            if idx >= len(palette):
                raise ValueError(
                    f"vp8l {origin}: palette index {idx} outside the "
                    f"{len(palette)}-entry palette"
                )
            out[y * w + x] = palette[idx]
    return out


# ------------------------------------------------------------- entry point


def decode_vp8l_argb(body: bytes, origin: str = "<bytes>"):
    """VP8L chunk body → ``(width, height, pixels)`` with ``pixels`` a
    row-major list of 32-bit ARGB ints — alpha PRESERVED. This is the
    form animation composition needs (``operators/webpanim.py`` blends
    per-frame alpha onto the canvas); :func:`decode_vp8l` is the
    corpus-convention RGB wrapper."""
    if len(body) < 5:
        raise ValueError(f"vp8l {origin}: {len(body)}-byte body truncated")
    if body[0] != 0x2F:
        raise ValueError(
            f"vp8l {origin}: signature byte 0x{body[0]:02X} != 0x2F"
        )
    header = int.from_bytes(body[1:5], "little")
    w = (header & 0x3FFF) + 1
    h = ((header >> 14) & 0x3FFF) + 1
    version = header >> 29
    if version != 0:
        raise ValueError(f"vp8l {origin}: version {version} != 0")
    if w * h > _MAX_PIXELS:
        raise ValueError(
            f"vp8l {origin}: declared geometry {w}x{h} past the "
            f"{_MAX_PIXELS}-pixel guard"
        )
    r = _Bits(body[5:], origin)
    # top-level transforms, read order recorded for reverse application
    transforms = []
    seen = set()
    cur_w = w
    while r.bit():
        t = r.bits(2)
        if t in seen:
            raise ValueError(
                f"vp8l {origin}: transform {t} appears twice"
            )
        seen.add(t)
        # each transform records the image width IN EFFECT at its read
        # point: color indexing with sub-byte bundling reduces the width
        # for everything read after it, and the reverse-order inverse
        # must operate at the matching width
        if t == _PREDICTOR or t == _COLOR:
            bits = 2 + r.bits(3)
            sw, sh = _subsample_size(cur_w, bits), _subsample_size(h, bits)
            sub = _decode_image_stream(r, sw, sh, False, origin)
            transforms.append((t, bits, sub, cur_w))
        elif t == _SUBTRACT_GREEN:
            transforms.append((t, 0, None, cur_w))
        else:  # COLOR_INDEXING
            psize = r.bits(8) + 1
            praw = _decode_image_stream(r, psize, 1, False, origin)
            palette = []
            prev = 0
            for p in praw:  # entries are per-channel delta-coded
                prev = _add_px(prev, p)
                palette.append(prev)
            xbits = _palette_width_bits(psize)
            transforms.append((t, xbits, palette, cur_w))
            if xbits:
                cur_w = _subsample_size(cur_w, xbits)
    px = _decode_image_stream(r, cur_w, h, True, origin)
    for t, bits, payload, tw in reversed(transforms):
        if t == _COLOR_INDEXING:
            px = _inv_color_indexing(px, tw, h, payload, bits, origin)
        elif t == _SUBTRACT_GREEN:
            _inv_subtract_green(px)
        elif t == _COLOR:
            _inv_color_transform(px, tw, h, payload, bits)
        else:
            _inv_predictor(px, tw, h, payload, bits, origin)
    return w, h, px


def decode_vp8l(body: bytes, origin: str = "<bytes>"):
    """VP8L chunk body → PngImage (RGB; decoded alpha dropped at the
    boundary, the tiff.py corpus convention)."""
    from .png import PngImage

    w, h, px = decode_vp8l_argb(body, origin)
    raw = bytearray(w * h * 3)
    o = 0
    for p in px:
        raw[o] = (p >> 16) & 0xFF
        raw[o + 1] = (p >> 8) & 0xFF
        raw[o + 2] = p & 0xFF
        o += 3
    return PngImage(w, h, 8, 2, 3, w * 3, bytes(raw), None)
