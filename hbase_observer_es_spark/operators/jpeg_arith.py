"""Arithmetic-coded JPEG entropy decoding (ITU-T T.81 Annex D + §F.2.4).

Closes the SOF9 (arithmetic-coded extended sequential) AND SOF10
(arithmetic-coded progressive) members of the JPEG refusal set: the QM
arithmetic decoder of Annex D (DECODE /
MPS_EXCHANGE / LPS_EXCHANGE / RENORMD / BYTEIN / INITDEC, software
conventions of §D.4) driving the DC and AC statistical models of
§F.2.4.1/.2 — conditioning contexts, the shared magnitude-category
decision trees, the fixed non-adaptive sign state, and the DAC
(Define Arithmetic Conditioning, §B.2.4.3) L/U/Kx parameters with the
spec defaults L=0, U=1, Kx=5. Everything after entropy decoding
(dequantization, IDCT, plane assembly, chroma upsampling, the 12-bit
``>>4`` render map) is the shared machinery in :mod:`.jpeg` — the
coding processes differ only in how coefficients arrive.

The probability-estimation state machine (``_QE``) is T.81 Table D.3 —
113 adaptive states plus the fixed ``0.5`` state 113 used for AC sign
decisions — transcribed from the ONE in-container copy of the
normative table: the system libjpeg-turbo's exported ``jpeg_aritab``
(itself the table from the standard). That sidesteps the D15 failure
mode (a misremembered normative constant that silently corrupts while
still parsing): the tests compile a small C driver against the system
``libjpeg`` and cross-pin this decoder against REAL arithmetic streams
it encodes — the same payload encoded Huffman and arithmetic must
produce BIT-IDENTICAL pixels through this package's shared IDCT, so a
single wrong table entry, context offset, or register operation fails
the cross-implementation comparison loudly (``tests/test_jpeg_arith.py``).

Progressive arithmetic (SOF10) rides the same decoder through the
G.2 scan models — DC/AC bands and bit planes with the Huffman path's
fail-loud scan-script state machine, statistics reset per scan and
per restart. What still refuses BY NAME: arithmetic-coded lossless
(SOF11) and the differential/hierarchical arithmetic processes
(SOF13-15) — the refusals stay in :mod:`.jpeg`'s ``_REFUSED_SOF``
dispatch.

Scale posture: identical to the Huffman path — entropy decode runs
inside the per-payload ``mapInPandas`` stages, pixels never cross a
shuffle.

Reference parity: none — the reference (HBase→ES CDC glue) has no media
surface; builder-brief (LLM-pipeline) surface extending SURVEY §2-D's
real-codec family.
"""

from __future__ import annotations

import struct

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH) per state; state 113 is the
# fixed non-adaptive 0.5 state (self-looping, never switches) used for
# AC sign decisions. Transcribed from the system libjpeg-turbo's
# jpeg_aritab copy of the normative table and pinned by the
# cross-implementation tests.
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

_FIXED = 113  # the non-adaptive 0.5 state (sign decisions)
_DC_BINS = 64
_AC_BINS = 256


class _ArithDecoder:
    """T.81 Annex D QM decoder, written as the exact algebraic mirror
    of the encoder's interval arithmetic: the MPS sub-interval sits at
    the BOTTOM of the current interval ``A`` (initially 0x10000), the
    LPS at the top with nominal width Qe, and conditional MPS/LPS
    exchange applies whenever ``A - Qe < Qe`` (the spec's
    MPS_EXCHANGE / LPS_EXCHANGE, Figures D.18/D.19). ``window`` holds
    the 16 code-stream bits currently aligned with ``A``; RENORMD
    doubles both and pulls stream bits in one at a time.

    Bit feeding follows the JPEG entropy-segment byte convention
    (§B.1.1.5, same as the Huffman path): a 0xFF data byte is followed
    by a stuffed 0x00 byte (skipped); 0xFF followed by anything else is
    a marker — the feeder freezes ``bp`` there and supplies 0-bits (the
    encoder's final flush pads the same way, so tail decisions resolve
    identically). Running past the payload end behaves as a marker."""

    __slots__ = ("data", "n", "bp", "a", "window", "bits", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.n = len(data)
        self.bp = pos
        self.bits = 0  # buffered stream bits (MSB-first in an int)
        self.nbits = 0
        self.window = 0
        for _ in range(16):
            self.window = (self.window << 1) | self._bit()
        self.a = 0x10000

    def _bit(self) -> int:
        if self.nbits == 0:
            data, n, bp = self.data, self.n, self.bp
            if bp >= n:
                self.bits, self.nbits = 0, 8  # past end: marker, feed 0s
            else:
                b = data[bp]
                if b == 0xFF:
                    b1 = data[bp + 1] if bp + 1 < n else 0xFF
                    if b1 != 0x00:
                        # marker: feed 0-bits, BP frozen at the 0xFF
                        self.bits, self.nbits = 0, 8
                    else:
                        # stuffed 0xFF00: one data byte 0xFF
                        self.bp = bp + 2
                        self.bits, self.nbits = 0xFF, 8
                else:
                    self.bp = bp + 1
                    self.bits, self.nbits = b, 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def decode(self, stats: bytearray, st: int) -> int:
        """One binary decision in context ``stats[st]`` (low 7 bits =
        Table D.3 state index, bit 7 = current MPS sense)."""
        sv = stats[st]
        qe, nmps, nlps, sw = _QE[sv & 0x7F]
        mps = sv >> 7
        t = self.a - qe
        if self.window < t:
            # code value in the MPS (bottom) sub-interval
            self.a = t
            if t & 0xFFFF8000:  # t >= 0x8000: no renormalization
                return mps
            if t < qe:  # MPS_EXCHANGE: conditional exchange hit
                d = mps ^ 1
                stats[st] = ((mps ^ sw) << 7) | nlps
            else:
                d = mps
                stats[st] = (mps << 7) | nmps
        else:
            self.window -= t
            self.a = qe
            if t < qe:  # LPS_EXCHANGE: conditional exchange hit
                d = mps
                stats[st] = (mps << 7) | nmps
            else:
                d = mps ^ 1
                stats[st] = ((mps ^ sw) << 7) | nlps
        a, window = self.a, self.window
        while a < 0x8000:  # RENORMD
            a <<= 1
            window = (window << 1) | self._bit()
        self.a, self.window = a, window
        return d


def _parse_dac(seg: bytes, dc_cond: dict, ac_cond: dict, origin: str) -> None:
    """DAC segment (§B.2.4.3): pairs of (Tc<<4|Tb, Cs). DC tables get
    Cs = (U<<4)|L with 0 <= L <= U <= 15; AC tables get Cs = Kx in
    1..63."""
    if len(seg) % 2:
        raise ValueError(
            f"jpeg {origin}: DAC segment length {len(seg)} is odd"
        )
    for i in range(0, len(seg), 2):
        tcb, cs = seg[i], seg[i + 1]
        tc, tb = tcb >> 4, tcb & 0x0F
        if tb > 3:
            raise ValueError(
                f"jpeg {origin}: DAC table id {tb} outside 0..3"
            )
        if tc == 0:
            u, l = cs >> 4, cs & 0x0F
            if l > u:
                raise ValueError(
                    f"jpeg {origin}: DAC DC conditioning L={l} > U={u}"
                )
            dc_cond[tb] = (l, u)
        elif tc == 1:
            if not 1 <= cs <= 63:
                raise ValueError(
                    f"jpeg {origin}: DAC AC conditioning Kx={cs} outside 1..63"
                )
            ac_cond[tb] = cs
        else:
            raise ValueError(f"jpeg {origin}: DAC class {tc} invalid")


def _decode_dc_diff(dec, stats, dc_ctx, ci, cond, prec, origin):
    """One DC difference (§F.2.4.1, Figures F.19-F.24): the zero/sign
    decisions in the conditioning-selected bin group, the first
    magnitude decision shared with the SP/SN bin, the X2..X15 chain at
    bins 20.., magnitude bits at +14, then the conditioning
    reclassification for the NEXT block (§F.1.4.4.1.2)."""
    st = dc_ctx[ci]
    if dec.decode(stats, st) == 0:
        dc_ctx[ci] = 0
        return 0
    sign = dec.decode(stats, st + 1)
    st += 2 + sign
    m = dec.decode(stats, st)
    if m:
        st = 20
        while dec.decode(stats, st):
            m <<= 1
            if m > 1 << (prec + 2):
                raise ValueError(
                    f"jpeg {origin}: arithmetic DC magnitude category "
                    f"exceeds the {prec}-bit range — corrupt entropy data"
                )
            st += 1
    l, u = cond
    if m < (1 << l) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << u) >> 1:
        dc_ctx[ci] = 12 + sign * 4
    else:
        dc_ctx[ci] = 4 + sign * 4
    v = m
    st += 14
    while m := m >> 1:
        if dec.decode(stats, st):
            v |= m
    v += 1
    return -v if sign else v


def _decode_ac_block(dec, stats, fixed, kx, coef, qt, zigzag, prec, origin):
    """AC coefficients of one block (§F.2.4.2, Figures F.20-F.24):
    per-k EOB/zero decisions at bins 3(k-1)+{0,1}, magnitude first
    decisions at +2, the shared high-category chains at 189/217 split
    by Kx, the fixed-state sign, magnitude bits at +14. Writes
    dequantized values into ``coef`` (natural order)."""
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(stats, st):  # EOB decision
            return
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > 63:
                raise ValueError(
                    f"jpeg {origin}: arithmetic AC zero run passes k=63 "
                    "— corrupt entropy data"
                )
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m:
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m > 1 << (prec + 1):
                        raise ValueError(
                            f"jpeg {origin}: arithmetic AC magnitude "
                            f"category exceeds the {prec}-bit range — "
                            "corrupt entropy data"
                        )
                    st += 1
        v = m
        st += 14
        while m := m >> 1:
            if dec.decode(stats, st):
                v |= m
        v += 1
        coef[zigzag[k]] = (-v if sign else v) * qt[k]
        k += 1


def decode_jpeg_arith(data: bytes, origin: str):
    """Decode one SOF9 (arithmetic-coded extended sequential) JPEG to a
    :class:`~.png.PngImage` — the marker walk of the Huffman path with
    DAC conditioning instead of DHT code tables, the Annex D decoder
    driving §F.2.4 statistics, and the shared dequant/IDCT/assembly."""
    from .jpeg import (
        ZIGZAG,
        _assemble_image,
        _idct_block,
        _parse_dqt,
        _parse_sof_body,
        _render_row,
    )

    pos = 2
    qtables: dict = {}
    dc_cond: dict = {}  # table id -> (L, U); default (0, 1)
    ac_cond: dict = {}  # table id -> Kx; default 5
    frame = None
    restart_interval = 0
    n = len(data)
    while True:
        if pos + 2 > n:
            raise ValueError(f"jpeg {origin}: truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(
                f"jpeg {origin}: expected marker at byte {pos}, found "
                f"0x{data[pos]:02X}"
            )
        while pos < n and data[pos] == 0xFF:
            pos += 1
        if pos >= n:
            raise ValueError(f"jpeg {origin}: truncated marker at stream end")
        marker = data[pos]
        pos += 1
        if marker == 0xD9:
            raise ValueError(f"jpeg {origin}: EOI before any scan")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise ValueError(f"jpeg {origin}: truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            raise ValueError(
                f"jpeg {origin}: segment 0xFF{marker:02X} length {seglen} "
                "overruns the stream"
            )
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xC9, 0xCC):
            # any OTHER SOF flavor inside an arithmetic-sequential
            # stream is a second frame header (r16 review: the pre-r16
            # by-name refusal must not regress into a silent skip)
            raise ValueError(
                f"jpeg {origin}: second frame header 0xFF{marker:02X} in "
                "an arithmetic sequential stream"
            )
        if marker == 0xDB:
            _parse_dqt(seg, qtables, origin)
        elif marker == 0xCC:
            _parse_dac(seg, dc_cond, ac_cond, origin)
        elif marker == 0xC9:
            if frame is not None:
                raise ValueError(f"jpeg {origin}: duplicate frame header")
            frame = _parse_sof_body(seg, origin, marker)
        elif marker == 0xDD:
            if len(seg) < 2:
                raise ValueError(f"jpeg {origin}: DRI segment body truncated")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError(f"jpeg {origin}: SOS before SOF")
            break
        # APPn / COM / DHT (meaningless here) / others: skipped
    height, width, comps, prec = frame
    level, maxv = 1 << (prec - 1), (1 << prec) - 1
    if not seg:
        raise ValueError(f"jpeg {origin}: SOS segment body truncated")
    ns = seg[0]
    if ns != len(comps):
        raise ValueError(
            f"jpeg {origin}: scan covers {ns} of {len(comps)} components — "
            "only the single interleaved sequential scan is supported"
        )
    if len(seg) < 1 + ns * 2 + 3:
        raise ValueError(f"jpeg {origin}: SOS header truncated")
    scan_tables = {}
    for i in range(ns):
        cs, tdta = seg[1 + i * 2 : 3 + i * 2]
        scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
    ss, se, ahal = seg[1 + ns * 2 : 4 + ns * 2]
    if (ss, se, ahal) != (0, 63, 0):
        raise ValueError(
            f"jpeg {origin}: spectral selection {ss}..{se}/{ahal:02x} is "
            "not the sequential full scan"
        )
    if len(comps) == 1:
        cid, _, _, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    metas = []  # (h, v, plane_w, td, ta, qtable)
    for cid, h, v, tq in comps:
        if tq not in qtables:
            raise ValueError(
                f"jpeg {origin}: component quant table {tq} undefined"
            )
        if cid not in scan_tables:
            raise ValueError(
                f"jpeg {origin}: scan names component ids "
                f"{sorted(scan_tables)} but the frame has id {cid}"
            )
        td, ta = scan_tables[cid]
        if td > 3 or ta > 3:
            raise ValueError(
                f"jpeg {origin}: arithmetic table ids dc{td}/ac{ta} "
                "outside 0..3"
            )
        pw, ph = mcus_x * h * 8, mcus_y * v * 8
        planes.append(bytearray(pw * ph))
        metas.append((h, v, pw, td, ta, qtables[tq]))

    # statistics areas are PER TABLE INDEX (components sharing a table
    # id share adaptive statistics); conditioning context + predictor
    # are per component
    def fresh_stats():
        dc = {td: bytearray(_DC_BINS) for _, _, _, td, _, _ in metas}
        ac = {ta: bytearray(_AC_BINS) for _, _, _, _, ta, _ in metas}
        fixed = bytearray([_FIXED])
        return dc, ac, fixed

    dc_stats, ac_stats, fixed = fresh_stats()
    dec = _ArithDecoder(data, pos)
    preds = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    pred_hi = 1 << (prec + 3)
    rst_n = 0
    since = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since == restart_interval:
                dec = _arith_restart(data, dec, origin, rst_n)
                rst_n = (rst_n + 1) % 8
                since = 0
                dc_stats, ac_stats, fixed = fresh_stats()
                preds = [0] * len(comps)
                dc_ctx = [0] * len(comps)
            for ci, (h, v, pw, td, ta, qt) in enumerate(metas):
                cond = dc_cond.get(td, (0, 1))
                kx = ac_cond.get(ta, 5)
                for by in range(v):
                    for bx in range(h):
                        coef = [0] * 64
                        diff = _decode_dc_diff(
                            dec, dc_stats[td], dc_ctx, ci, cond, prec,
                            origin,
                        )
                        preds[ci] += diff
                        if not -pred_hi <= preds[ci] < pred_hi:
                            raise ValueError(
                                f"jpeg {origin}: DC predictor "
                                f"{preds[ci]} outside the {prec}-bit "
                                "precision range — corrupt entropy data"
                            )
                        coef[0] = preds[ci] * qt[0]
                        _decode_ac_block(
                            dec, ac_stats[ta], fixed, kx, coef, qt,
                            ZIGZAG, prec, origin,
                        )
                        px = _idct_block(coef, level, maxv)
                        ox = (mx * h + bx) * 8
                        oy = (my * v + by) * 8
                        plane = planes[ci]
                        for yy in range(8):
                            row = (oy + yy) * pw + ox
                            plane[row : row + 8] = _render_row(px, yy, prec)
            since += 1
    return _assemble_image(width, height, [m[:3] for m in metas], planes,
                           hmax, vmax)


# ------------------------------------------------ progressive (G.2)


def decode_jpeg_arith_progressive(data: bytes, origin: str):
    """Decode one SOF10 (arithmetic-coded progressive) JPEG: the scan
    script delivers coefficients in DC/AC bands and bit planes exactly
    as the Huffman progressive path (T.81 annex G scan-script rules,
    validated with the same fail-loud state tracking), but each scan's
    entropy data is the Annex D QM decoder over the G.2 statistical
    models — DC first scans reuse the sequential DC model shifted by
    Al, DC refinements read one fixed-state bit per block, AC first
    scans reuse the sequential AC model over the band, AC refinements
    follow G.2.3's EOBx (``kex``) walk with fixed-state signs for
    newly nonzero coefficients. Statistics reset at every scan start
    and at every restart marker, per the spec."""
    from array import array

    from .jpeg import (
        ZIGZAG,
        _assemble_image,
        _idct_block,
        _parse_dqt,
        _parse_sof_body,
        _render_row,
    )

    pos = 2
    qtables: dict = {}
    dc_cond: dict = {}
    ac_cond: dict = {}
    frame = None
    restart_interval = 0
    n = len(data)
    coefs: list = []
    metas: list = []  # (h, v, bw_pad, bh_pad, bw_ni, bh_ni, tq)
    dc_al: list = []
    ac_al: list = []
    preds: list = []
    mcus_x = mcus_y = hmax = vmax = 0
    cid_index: dict = {}
    while True:
        if pos + 2 > n:
            raise ValueError(f"jpeg {origin}: truncated before EOI")
        if data[pos] != 0xFF:
            raise ValueError(
                f"jpeg {origin}: expected marker at byte {pos}, found "
                f"0x{data[pos]:02X}"
            )
        while pos < n and data[pos] == 0xFF:
            pos += 1
        if pos >= n:
            raise ValueError(f"jpeg {origin}: truncated marker at stream end")
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise ValueError(f"jpeg {origin}: truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            raise ValueError(
                f"jpeg {origin}: segment 0xFF{marker:02X} length {seglen} "
                "overruns the stream"
            )
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCA, 0xCC):
            raise ValueError(
                f"jpeg {origin}: second frame header 0xFF{marker:02X} in a "
                "progressive stream"
            )
        if marker == 0xDB:
            _parse_dqt(seg, qtables, origin)
        elif marker == 0xCC:
            _parse_dac(seg, dc_cond, ac_cond, origin)
        elif marker == 0xDD:
            if len(seg) < 2:
                raise ValueError(f"jpeg {origin}: DRI segment body truncated")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xCA:  # SOF10
            if frame is not None:
                raise ValueError(f"jpeg {origin}: duplicate frame header")
            frame = _parse_sof_body(seg, origin, marker)
            height, width, comps, prec = frame
            if len(comps) == 1:
                cid, _, _, tq = comps[0]
                comps = [(cid, 1, 1, tq)]
                frame = (height, width, comps, prec)
            hmax = max(h for _, h, _, _ in comps)
            vmax = max(v for _, _, v, _ in comps)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            for ci, (cid, h, v, tq) in enumerate(comps):
                if cid in cid_index:
                    raise ValueError(
                        f"jpeg {origin}: duplicate component id {cid}"
                    )
                cid_index[cid] = ci
                bw_pad, bh_pad = mcus_x * h, mcus_y * v
                cw = -(-width * h // hmax)
                ch = -(-height * v // vmax)
                metas.append(
                    (h, v, bw_pad, bh_pad, -(-cw // 8), -(-ch // 8), tq)
                )
                coefs.append(array("i", (0,)) * (bw_pad * bh_pad * 64))
                dc_al.append(None)
                ac_al.append([None] * 64)
                preds.append(0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError(f"jpeg {origin}: SOS before SOF")
            pos = _arith_progressive_scan(
                data, pos, seg, origin, frame, metas, coefs, dc_al, ac_al,
                preds, cid_index, dc_cond, ac_cond, restart_interval,
                mcus_x, mcus_y,
            )
        # APPn / COM / DHT: skipped
    if frame is None:
        raise ValueError(f"jpeg {origin}: EOI before any frame header")
    height, width, comps, prec = frame
    level, maxv = 1 << (prec - 1), (1 << prec) - 1
    for ci, (cid, h, v, tq) in enumerate(comps):
        if dc_al[ci] != 0:
            raise ValueError(
                f"jpeg {origin}: progressive scan script incomplete — "
                f"component {cid} DC "
                + ("never scanned" if dc_al[ci] is None
                   else f"stops at bit plane {dc_al[ci]}")
            )
        bad = [k for k in range(1, 64) if ac_al[ci][k] != 0]
        if bad:
            raise ValueError(
                f"jpeg {origin}: progressive scan script incomplete — "
                f"component {cid} AC coefficients {bad[0]}..{bad[-1]} "
                "missing or above bit plane 0"
            )
        if tq not in qtables:
            raise ValueError(
                f"jpeg {origin}: component quant table {tq} undefined"
            )
    planes = []
    geom = []
    for ci, (cid, h, v, tq) in enumerate(comps):
        _, _, bw_pad, bh_pad, _, _, _ = metas[ci]
        qt = qtables[tq]
        pw, ph = bw_pad * 8, bh_pad * 8
        plane = bytearray(pw * ph)
        blocks = coefs[ci]
        for byi in range(bh_pad):
            for bxi in range(bw_pad):
                off = (byi * bw_pad + bxi) * 64
                nat = [0] * 64
                for k in range(64):
                    c = blocks[off + k]
                    if c:
                        nat[ZIGZAG[k]] = c * qt[k]
                px = _idct_block(nat, level, maxv)
                ox, oy = bxi * 8, byi * 8
                for yy in range(8):
                    row = (oy + yy) * pw + ox
                    plane[row : row + 8] = _render_row(px, yy, prec)
        planes.append(plane)
        geom.append((h, v, pw))
    return _assemble_image(width, height, geom, planes, hmax, vmax)


def _next_marker(data: bytes, start: int, origin: str) -> int:
    """Position of the next marker's 0xFF from ``start`` (inside
    arithmetic entropy data every 0xFF is followed by a stuffed 0x00,
    so the first 0xFF with a nonzero successor is the marker)."""
    n = len(data)
    p = start
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            return p
        p += 1
    raise ValueError(
        f"jpeg {origin}: entropy data runs past the stream end at byte {p}"
    )


def _arith_progressive_scan(
    data, pos, seg, origin, frame, metas, coefs, dc_al, ac_al, preds,
    cid_index, dc_cond, ac_cond, restart_interval, mcus_x, mcus_y,
):
    """One progressive scan: header validation (same scan-script state
    machine as the Huffman path) + the G.2 arithmetic entropy body.
    Returns the stream position of the marker following the scan."""
    n = len(data)
    prec = frame[3]
    if not seg:
        raise ValueError(f"jpeg {origin}: SOS segment body truncated")
    ns = seg[0]
    if not 1 <= ns <= 4:
        raise ValueError(
            f"jpeg {origin}: scan component count {ns} outside the "
            "spec's 1..4"
        )
    if len(seg) < 1 + ns * 2 + 3:
        raise ValueError(f"jpeg {origin}: SOS header truncated")
    scan_comps = []  # (ci, td, ta)
    for i in range(ns):
        cs, tdta = seg[1 + i * 2 : 3 + i * 2]
        if cs not in cid_index:
            raise ValueError(
                f"jpeg {origin}: scan names component id {cs} the frame "
                "does not have"
            )
        td, ta = tdta >> 4, tdta & 0x0F
        if td > 3 or ta > 3:
            raise ValueError(
                f"jpeg {origin}: arithmetic table ids dc{td}/ac{ta} "
                "outside 0..3"
            )
        scan_comps.append((cid_index[cs], td, ta))
    ss, se, ahal = seg[1 + ns * 2 : 4 + ns * 2]
    ah, al = ahal >> 4, ahal & 0x0F
    if al > 13 or (ah and ah > 13):
        raise ValueError(
            f"jpeg {origin}: successive approximation {ah}/{al} outside "
            "the spec's 0..13"
        )
    if ah and al != ah - 1:
        raise ValueError(
            f"jpeg {origin}: refinement must lower one bit plane "
            f"(Ah={ah}, Al={al})"
        )
    dec = _ArithDecoder(data, pos)
    if ss == 0:
        if se != 0:
            raise ValueError(
                f"jpeg {origin}: progressive DC scan must have Se=0 "
                f"(Ss=0, Se={se})"
            )
        for ci, _td, _ta in scan_comps:
            if ah == 0:
                if dc_al[ci] is not None:
                    raise ValueError(
                        f"jpeg {origin}: duplicate first DC scan for "
                        f"component index {ci}"
                    )
            elif dc_al[ci] != ah:
                raise ValueError(
                    f"jpeg {origin}: DC refinement at Ah={ah} but "
                    f"component index {ci} is at bit plane {dc_al[ci]}"
                )
            dc_al[ci] = al
        dec = _arith_scan_dc(
            dec, data, origin, scan_comps, metas, coefs, preds, dc_cond,
            ah, al, prec, restart_interval, mcus_x, mcus_y,
        )
    else:
        if ns != 1:
            raise ValueError(
                f"jpeg {origin}: progressive AC scan must be "
                f"single-component (Ss={ss}, {ns} components)"
            )
        if not (ss <= se <= 63):
            raise ValueError(
                f"jpeg {origin}: spectral band {ss}..{se} invalid"
            )
        ci, _td, ta = scan_comps[0]
        if dc_al[ci] is None:
            raise ValueError(
                f"jpeg {origin}: AC scan before the component's first DC "
                "scan"
            )
        band_state = {ac_al[ci][k] for k in range(ss, se + 1)}
        if ah == 0:
            if band_state != {None}:
                raise ValueError(
                    f"jpeg {origin}: first AC scan over band {ss}..{se} "
                    "overlaps an already-scanned band"
                )
        elif band_state != {ah}:
            raise ValueError(
                f"jpeg {origin}: AC refinement at Ah={ah} over band "
                f"{ss}..{se} whose state is {sorted(band_state, key=str)}"
            )
        for k in range(ss, se + 1):
            ac_al[ci][k] = al
        dec = _arith_scan_ac(
            dec, data, origin, ci, metas[ci], coefs[ci],
            ac_cond.get(ta, 5), ss, se, ah, al, prec, restart_interval,
        )
    return _next_marker(data, dec.bp, origin) if dec.bp < n else n


def _arith_restart(data, dec, origin, rst_n):
    """Locate and verify the expected RSTn past the decoder's read
    point; returns a fresh decoder positioned after the marker."""
    n = len(data)
    p = _next_marker(data, dec.bp, origin)
    while p < n and data[p] == 0xFF:
        p += 1
    if p >= n:
        raise ValueError(
            f"jpeg {origin}: expected restart marker near byte {p}, "
            "stream ends"
        )
    if data[p] != 0xD0 + rst_n:
        raise ValueError(
            f"jpeg {origin}: expected RST{rst_n} at byte {p - 1}, found "
            f"0xFF{data[p]:02X}"
        )
    return _ArithDecoder(data, p + 1)


def _arith_scan_dc(
    dec, data, origin, scan_comps, metas, coefs, preds, dc_cond, ah, al,
    prec, restart_interval, mcus_x, mcus_y,
):
    """Progressive DC scan (G.2.1/G.2.2): first pass is the sequential
    DC model with the decoded diff accumulating into the per-component
    prediction and the value landing shifted by Al; refinement reads
    one fixed-state bit per block."""
    interleaved = len(scan_comps) > 1
    stats = {td: bytearray(_DC_BINS) for _, td, _ in scan_comps}
    fixed = bytearray([_FIXED])
    dc_ctx = {ci: 0 for ci, _, _ in scan_comps}
    for ci, _, _ in scan_comps:
        preds[ci] = 0
    pred_hi = 1 << (prec + 3)
    rst_n = 0
    since = 0

    def one_block(ci, td, blocks, off):
        if ah == 0:
            diff = _decode_dc_diff(
                dec, stats[td], dc_ctx, ci, dc_cond.get(td, (0, 1)),
                prec, origin,
            )
            preds[ci] += diff
            if not -pred_hi <= preds[ci] < pred_hi:
                raise ValueError(
                    f"jpeg {origin}: DC predictor {preds[ci]} outside "
                    f"the {prec}-bit precision range — corrupt entropy "
                    "data"
                )
            blocks[off] = preds[ci] << al
        elif dec.decode(fixed, 0):
            blocks[off] |= 1 << al

    if interleaved:
        total = mcus_x * mcus_y
        for m in range(total):
            if restart_interval and since == restart_interval:
                dec = _arith_restart(data, dec, origin, rst_n)
                rst_n = (rst_n + 1) % 8
                since = 0
                for td in stats:
                    stats[td] = bytearray(_DC_BINS)
                fixed = bytearray([_FIXED])
                dc_ctx = {ci: 0 for ci in dc_ctx}
                for ci, _, _ in scan_comps:
                    preds[ci] = 0
            my, mx = divmod(m, mcus_x)
            for ci, td, _ta in scan_comps:
                h, v, bw_pad = metas[ci][0], metas[ci][1], metas[ci][2]
                blocks = coefs[ci]
                for by in range(v):
                    for bx in range(h):
                        off = (
                            (my * v + by) * bw_pad + (mx * h + bx)
                        ) * 64
                        one_block(ci, td, blocks, off)
            since += 1
    else:
        ci, td, _ta = scan_comps[0]
        _h, _v, bw_pad, _bh_pad, bw_ni, bh_ni, _tq = metas[ci]
        blocks = coefs[ci]
        for m in range(bw_ni * bh_ni):
            if restart_interval and since == restart_interval:
                dec = _arith_restart(data, dec, origin, rst_n)
                rst_n = (rst_n + 1) % 8
                since = 0
                stats[td] = bytearray(_DC_BINS)
                fixed = bytearray([_FIXED])
                dc_ctx = {ci: 0}
                preds[ci] = 0
            byi, bxi = divmod(m, bw_ni)
            one_block(ci, td, blocks, (byi * bw_pad + bxi) * 64)
            since += 1
    return dec


def _arith_scan_ac(
    dec, data, origin, ci, meta, blocks, kx, ss, se, ah, al, prec,
    restart_interval,
):
    """Progressive AC band scan (G.2.3, always non-interleaved). First
    pass is the sequential AC model confined to the band with values
    shifted by Al; refinement walks the band with the EOBx (``kex``)
    rule — correction bits for nonzero-history coefficients, fixed-
    state signs for newly nonzero ones."""
    _h, _v, bw_pad, _bh_pad, bw_ni, bh_ni, _tq = meta
    stats = bytearray(_AC_BINS)
    fixed = bytearray([_FIXED])
    rst_n = 0
    since = 0
    p1 = 1 << al
    m1 = -1 << al
    for m in range(bw_ni * bh_ni):
        if restart_interval and since == restart_interval:
            dec = _arith_restart(data, dec, origin, rst_n)
            rst_n = (rst_n + 1) % 8
            since = 0
            stats = bytearray(_AC_BINS)
            fixed = bytearray([_FIXED])
        byi, bxi = divmod(m, bw_ni)
        base = (byi * bw_pad + bxi) * 64
        if ah == 0:
            k = ss
            while k <= se:
                st = 3 * (k - 1)
                if dec.decode(stats, st):  # EOB decision
                    break
                while dec.decode(stats, st + 1) == 0:
                    st += 3
                    k += 1
                    if k > se:
                        raise ValueError(
                            f"jpeg {origin}: arithmetic AC zero run "
                            f"passes the band end {se} — corrupt "
                            "entropy data"
                        )
                sign = dec.decode(fixed, 0)
                st += 2
                mm = dec.decode(stats, st)
                if mm:
                    if dec.decode(stats, st):
                        mm = 2
                        st = 189 if k <= kx else 217
                        while dec.decode(stats, st):
                            mm <<= 1
                            if mm > 1 << (prec + 1):
                                raise ValueError(
                                    f"jpeg {origin}: arithmetic AC "
                                    "magnitude category exceeds the "
                                    f"{prec}-bit range — corrupt "
                                    "entropy data"
                                )
                            st += 1
                v = mm
                st += 14
                while mm := mm >> 1:
                    if dec.decode(stats, st):
                        v |= mm
                v += 1
                blocks[base + k] = (-v if sign else v) << al
                k += 1
        else:
            # G.2.3 refinement: kex is the highest band index with
            # nonzero history; EOB decisions only apply above it
            kex = se
            while kex >= ss and blocks[base + kex] == 0:
                kex -= 1
            k = ss
            while k <= se:
                st = 3 * (k - 1)
                if k > kex:
                    if dec.decode(stats, st):  # EOB flag
                        break
                while True:
                    cur = blocks[base + k]
                    if cur:
                        if dec.decode(stats, st + 2):
                            blocks[base + k] = (
                                cur + m1 if cur < 0 else cur + p1
                            )
                        break
                    if dec.decode(stats, st + 1):
                        blocks[base + k] = (
                            m1 if dec.decode(fixed, 0) else p1
                        )
                        break
                    st += 3
                    k += 1
                    if k > se:
                        raise ValueError(
                            f"jpeg {origin}: AC refinement runs past "
                            f"the band end {se} — corrupt entropy data"
                        )
                k += 1
        since += 1
    return dec
