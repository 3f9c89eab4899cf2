"""Progressive JPEG (SOF2, T.81 annex G) decode tests.

Strategy: a TEST-SIDE stream builder encodes explicit per-block coefficient
arrays twice — once as a baseline (SOF0) single-scan stream, once as a
progressive (SOF2) stream under an arbitrary scan script (spectral
selection bands, successive-approximation bit planes, EOB-run batching,
refinement correction bits). Both run through the production decoder; the
entropy layers are disjoint code paths, the IDCT/upsample/assembly is
shared, so pixel equality pins the whole annex-G scan machinery against
the already-golden-pinned baseline path. One stream is additionally packed
fully BY HAND (every bit written out in the comments) so the builder
itself is anchored, and hypothesis drives random coefficients × random
scan scripts over gray, 4:4:4, and 4:2:0 geometry (where the padded
interleaved DC grid and the non-interleaved AC grid genuinely differ).
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.jpeg import decode_jpeg

# ---------------------------------------------------------------- bit sink


class _Bits:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # 1-fill
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0
        return bytes(self.out)


def _huff(symbols: list) -> tuple:
    """Trivial canonical table: all distinct symbols at one code length L
    with 2^L > n (so the all-ones code stays unused). Returns
    (dht_payload_sans_class_id, {sym: (code, L)})."""
    syms = sorted(set(symbols))
    n = len(syms)
    length = max(1, (n + 1 - 1).bit_length())  # 2^length >= n + 1
    if (1 << length) < n + 1:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    codes = {s: (i, length) for i, s in enumerate(syms)}
    return bytes(bits) + bytes(syms), codes


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


# ------------------------------------------------------------- geometry


def _geometry(width: int, height: int, comps: list) -> dict:
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    per = []
    for cid, h, v, tq in comps:
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        per.append(
            {
                "bw_pad": mcus_x * h,
                "bh_pad": mcus_y * v,
                "bw_ni": -(-cw // 8),
                "bh_ni": -(-ch // 8),
            }
        )
    return {"hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y,
            "per": per}


def _csize(v: int) -> int:
    return abs(v).bit_length()


def _sig_bits(v: int, t: int) -> int:
    """JPEG signed-magnitude payload bits for a category-t value."""
    return v if v >= 0 else v + (1 << t) - 1


# ------------------------------------------------- baseline stream builder


def build_baseline(width, height, comps, qtables, blocks) -> bytes:
    """SOF0 single interleaved scan from explicit zigzag coefficient
    blocks (padded-grid layout, one list[64] per block)."""
    g = _geometry(width, height, comps)
    mcu_units = []  # (ci, block) in interleaved MCU order
    for m in range(g["mcus_x"] * g["mcus_y"]):
        my, mx = divmod(m, g["mcus_x"])
        for ci, (cid, h, v, tq) in enumerate(comps):
            bw = g["per"][ci]["bw_pad"]
            for by in range(v):
                for bx in range(h):
                    mcu_units.append(
                        (ci, blocks[ci][(my * v + by) * bw + (mx * h + bx)])
                    )

    def emit(writer, dc_codes, ac_codes, dc_syms, ac_syms):
        preds = [0] * len(comps)
        for ci, blk in mcu_units:
            diff = blk[0] - preds[ci]
            preds[ci] = blk[0]
            t = _csize(diff)
            if writer is None:
                dc_syms.append(t)
            else:
                writer.put(*dc_codes[t])
                writer.put(_sig_bits(diff, t), t)
            run = 0
            for k in range(1, 64):
                if blk[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    if writer is None:
                        ac_syms.append(0xF0)
                    else:
                        writer.put(*ac_codes[0xF0])
                    run -= 16
                s = _csize(blk[k])
                if writer is None:
                    ac_syms.append((run << 4) | s)
                else:
                    writer.put(*ac_codes[(run << 4) | s])
                    writer.put(_sig_bits(blk[k], s), s)
                run = 0
            if run:
                if writer is None:
                    ac_syms.append(0x00)
                else:
                    writer.put(*ac_codes[0x00])

    dc_syms: list = []
    ac_syms: list = []
    emit(None, None, None, dc_syms, ac_syms)
    dc_payload, dc_codes = _huff(dc_syms)
    ac_payload, ac_codes = _huff(ac_syms or [0x00])
    w2 = _Bits()
    emit(w2, dc_codes, ac_codes, None, None)
    out = bytearray(b"\xff\xd8")
    for tq in sorted({tq for _, _, _, tq in comps}):
        out += _seg(0xDB, bytes([tq]) + bytes(qtables[tq]))
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, h, v, tq in comps:
        sof += bytes([cid, (h << 4) | v, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, b"\x00" + dc_payload)
    out += _seg(0xC4, b"\x10" + ac_payload)
    sos = bytes([len(comps)])
    for cid, _h, _v, _tq in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += w2.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------- progressive stream builder


def build_progressive(width, height, comps, qtables, blocks, scans) -> bytes:
    """SOF2 stream from explicit zigzag coefficient blocks under a scan
    script: scans = [(comp_indices, Ss, Se, Ah, Al)]. Encodes the T.81
    annex-G bit streams test-side: DC point transform is an ARITHMETIC
    shift, AC is truncation toward zero; refinement emits correction bits
    for every nonzero-history coefficient in walk order and batches
    correction-only blocks into EOB runs."""
    g = _geometry(width, height, comps)
    out = bytearray(b"\xff\xd8")
    for tq in sorted({tq for _, _, _, tq in comps}):
        out += _seg(0xDB, bytes([tq]) + bytes(qtables[tq]))
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, h, v, tq in comps:
        sof += bytes([cid, (h << 4) | v, tq])
    out += _seg(0xC2, sof)
    for cis, ss, se, ah, al in scans:
        syms, bitstream = _encode_scan(
            comps, g, blocks, cis, ss, se, ah, al, None, None
        )
        payload, codes = _huff(syms or [0x00])
        # DC refinements need no huffman table at all; DC first scans use
        # class 0, AC scans (first and refinement) class 1
        if ss == 0:
            if ah == 0:
                out += _seg(0xC4, b"\x00" + payload)
        else:
            out += _seg(0xC4, b"\x10" + payload)
        w = _Bits()
        _encode_scan(comps, g, blocks, cis, ss, se, ah, al, w, codes)
        sos = bytes([len(cis)])
        for ci in cis:
            cid = comps[ci][0]
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _encode_scan(comps, g, blocks, cis, ss, se, ah, al, w, codes):
    """Two-pass helper: with w=None collects huffman symbols, else writes
    bits. Returns (symbols, None)."""
    syms: list = []

    def put_sym(sym):
        if w is None:
            syms.append(sym)
        else:
            w.put(*codes[sym])

    def put_bits(val, n):
        if w is not None and n:
            w.put(val, n)

    if ss == 0 and ah == 0:  # DC first
        preds = {ci: 0 for ci in cis}
        for ci, blk in _dc_block_order(comps, g, blocks, cis):
            v = blk[0] >> al  # arithmetic shift: the DC point transform
            diff = v - preds[ci]
            preds[ci] = v
            t = _csize(diff)
            put_sym(t)
            put_bits(_sig_bits(diff, t), t)
    elif ss == 0:  # DC refinement: one raw bit per block, no huffman
        for _ci, blk in _dc_block_order(comps, g, blocks, cis):
            put_bits((blk[0] >> al) & 1, 1)
        if w is None:
            return [], None
    elif ah == 0:  # AC first
        (ci,) = cis
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                put_sym(r << 4)
                put_bits(eobrun - (1 << r), r)
                eobrun = 0

        for blk in _ni_block_order(g, blocks, ci):
            vals = {k: _trunc(blk[k], al) for k in range(ss, se + 1)}
            if not any(vals.values()):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(ss, se + 1):
                v = vals[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    put_sym(0xF0)
                    run -= 16
                s = _csize(v)
                put_sym((run << 4) | s)
                put_bits(_sig_bits(v, s), s)
                run = 0
            if run:
                eobrun = 1
        flush_eob()
    else:  # AC refinement
        (ci,) = cis
        eobrun = 0
        eob_bits: list = []  # queued correction bits for the open EOB run

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                put_sym(r << 4)
                put_bits(eobrun - (1 << r), r)
                for b in eob_bits:
                    put_bits(b, 1)
                eob_bits.clear()
                eobrun = 0

        for blk in _ni_block_order(g, blocks, ci):
            newly = [
                k for k in range(ss, se + 1) if abs(blk[k]) >> al == 1
            ]
            if not newly:
                # correction-only block: joins the EOB run; its history
                # corrections queue behind the (future) EOBn symbol
                for k in range(ss, se + 1):
                    if abs(blk[k]) >> (al + 1):
                        eob_bits.append((abs(blk[k]) >> al) & 1)
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()  # close any open run BEFORE this block's symbols
            k = ss
            for j in newly:
                # count zero-HISTORY positions strictly before j (ZRL per
                # 16); history-nonzero corrections ride behind whichever
                # symbol's walk passes them, in positional order
                r = 0
                pend: list = []
                kk = k
                while kk < j:
                    if abs(blk[kk]) >> (al + 1):
                        pend.append((abs(blk[kk]) >> al) & 1)
                    else:
                        if r == 15:
                            put_sym(0xF0)
                            for b in pend:
                                put_bits(b, 1)
                            pend = []
                            r = 0
                        else:
                            r += 1
                    kk += 1
                sign = 1 if blk[j] > 0 else 0
                put_sym((r << 4) | 1)
                put_bits(sign, 1)
                for b in pend:
                    put_bits(b, 1)
                k = j + 1
            if k <= se:
                # the decoder keeps decoding symbols until k > Se, so a
                # block whose last new coefficient sits before Se must be
                # closed by an EOB run that includes it — its tail
                # corrections queue first
                eob_bits.extend(
                    (abs(blk[kk]) >> al) & 1
                    for kk in range(k, se + 1)
                    if abs(blk[kk]) >> (al + 1)
                )
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
    return syms, None


def _trunc(v: int, al: int) -> int:
    """AC point transform: division by 2^Al truncated TOWARD ZERO."""
    return -((-v) >> al) if v < 0 else v >> al


def _dc_block_order(comps, g, blocks, cis):
    if len(cis) > 1:  # interleaved MCU walk
        for m in range(g["mcus_x"] * g["mcus_y"]):
            my, mx = divmod(m, g["mcus_x"])
            for ci in cis:
                _cid, h, v, _tq = comps[ci]
                bw = g["per"][ci]["bw_pad"]
                for by in range(v):
                    for bx in range(h):
                        yield ci, blocks[ci][
                            (my * v + by) * bw + (mx * h + bx)
                        ]
    else:
        (ci,) = cis
        for blk in _ni_block_order(g, blocks, ci):
            yield ci, blk


def _ni_block_order(g, blocks, ci):
    p = g["per"][ci]
    for m in range(p["bw_ni"] * p["bh_ni"]):
        byi, bxi = divmod(m, p["bw_ni"])
        yield blocks[ci][byi * p["bw_pad"] + bxi]


# ------------------------------------------------------------------- tests


def _pad_blocks(nblocks: int, sparse: dict) -> list:
    """Padded-grid coefficient blocks from {block_index: {k: value}}."""
    out = [[0] * 64 for _ in range(nblocks)]
    for bi, kv in sparse.items():
        for k, v in kv.items():
            out[bi][k] = v
    return out


_QT1 = [1] * 64  # unit quantizer: decoded pixels depend on coefficients only


def _gray_comps():
    return [(1, 1, 1, 0)]


def _decode_pair(width, height, comps, qtables, blocks, scans):
    base = decode_jpeg(build_baseline(width, height, comps, qtables, blocks))
    prog = decode_jpeg(build_progressive(width, height, comps, qtables,
                                         blocks, scans))
    return base, prog


def test_progressive_spectral_only_equals_baseline_gray():
    """Pure spectral selection, Al=0 throughout: DC scan + two AC bands."""
    blocks = {0: {0: 40, 1: -12, 8: 7, 20: 3}, 1: {0: -25, 63: -1}}
    blks = [_pad_blocks(2, blocks)]
    scans = [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0)]
    base, prog = _decode_pair(16, 8, _gray_comps(), {0: _QT1}, blks, scans)
    assert prog.raw == base.raw and (prog.width, prog.height) == (16, 8)


def test_progressive_successive_approximation_gray():
    """DC at Al=2 with two refinements; AC band at Al=1 with one
    refinement — every G.1.2 bit path (first pass, correction bits, EOB
    runs with queued corrections)."""
    blocks = {
        0: {0: 37, 1: -13, 2: 5, 10: -2, 30: 1},
        1: {0: -6, 1: 2, 63: -3},
        2: {},  # all-zero block: exercises EOB batching across blocks
        3: {0: 127, 5: -1},
    }
    blks = [_pad_blocks(4, blocks)]
    scans = [
        ([0], 0, 0, 0, 2),   # DC first, 2 bits held back
        ([0], 1, 63, 0, 1),  # AC first at Al=1
        ([0], 0, 0, 2, 1),   # DC refinement to plane 1
        ([0], 1, 63, 1, 0),  # AC refinement to plane 0
        ([0], 0, 0, 1, 0),   # DC refinement to plane 0
    ]
    base, prog = _decode_pair(32, 8, _gray_comps(), {0: _QT1}, blks, scans)
    assert prog.raw == base.raw


def test_progressive_color_420_padded_vs_ni_grids():
    """4:2:0: the interleaved DC walk covers the MCU-padded luma grid
    (4 block columns at width 24) while the AC scans walk the
    non-interleaved raster (3 columns) — the annex-G geometry split."""
    comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    g = _geometry(24, 16, comps)
    assert g["per"][0]["bw_pad"] == 4 and g["per"][0]["bw_ni"] == 3
    blocks = [
        _pad_blocks(8, {0: {0: 50, 1: 9}, 1: {0: -30, 8: -4}, 2: {0: 10},
                        5: {0: 5, 20: 2}, 7: {0: -128}}),
        _pad_blocks(2, {0: {0: 12, 1: -6}, 1: {0: -12}}),
        _pad_blocks(2, {0: {0: -8, 2: 3}, 1: {0: 8}}),
    ]
    scans = [
        ([0, 1, 2], 0, 0, 0, 1),  # interleaved DC first at Al=1
        ([0], 1, 63, 0, 1),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
        ([0, 1, 2], 0, 0, 1, 0),  # interleaved DC refinement
        ([0], 1, 63, 1, 0),
    ]
    base, prog = _decode_pair(24, 16, comps, {0: _QT1, 1: _QT1}, blocks,
                              scans)
    assert prog.raw == base.raw and prog.color_type == 2


def test_progressive_handpacked_golden():
    """One stream packed fully by hand: 8x8 gray, DC at Al=1 + DC
    refinement, AC 1..63 at Al=0. Coefficients: DC=10, AC k=1 (zigzag)
    = -3. DC first scan: V = 10>>1 = 5, diff=5, category 3, sig bits 101.
    DC huffman: single symbol 3 at length 1 → code 0. First scan bits:
    0 101 + 1-padding. AC scan: symbol (0<<4|2) for -3 (category 2, sig
    bits 00), then EOB (0x00). AC huffman: symbols {0x00, 0x02} at
    length 2 → 0x00→code 00, 0x02→code 01. Bits: 01 00 00 → 010000 +
    1-pad = 01000011. DC refinement: raw bit (10>>0)&1 = 0 → 0 + 7-pad
    = 01111111."""
    dqt = _seg(0xDB, bytes([0]) + bytes(_QT1))
    sof = _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = _seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + bytes([3]))
    sos_dc = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    ecs_dc = bytes([0b01011111])  # code 0, diff bits 101, pad 1111
    dht_ac = _seg(0xC4, b"\x10" + bytes([0, 2] + [0] * 14) + bytes([0x00, 0x02]))
    sos_ac = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    ecs_ac = bytes([0b01000011])  # sym 0x02=01, bits 00, EOB=00, pad 11
    sos_dcr = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    ecs_dcr = bytes([0b01111111])  # bit 0, pad 1111111
    data = (
        b"\xff\xd8" + dqt + sof
        + dht_dc + sos_dc + ecs_dc
        + dht_ac + sos_ac + ecs_ac
        + sos_dcr + ecs_dcr
        + b"\xff\xd9"
    )
    img = decode_jpeg(data)
    # same coefficients through the baseline path
    blks = [_pad_blocks(1, {0: {0: 10, 1: -3}})]
    base = decode_jpeg(build_baseline(8, 8, _gray_comps(), {0: _QT1}, blks))
    assert img.raw == base.raw
    # and through the builder, byte-for-byte semantics
    prog = decode_jpeg(build_progressive(
        8, 8, _gray_comps(), {0: _QT1}, blks,
        [([0], 0, 0, 0, 1), ([0], 1, 63, 0, 0), ([0], 0, 0, 1, 0)],
    ))
    assert prog.raw == base.raw


def test_progressive_scan_script_violations():
    blks = [_pad_blocks(1, {0: {0: 10, 1: -3}})]
    q = {0: _QT1}
    cases = [
        # refinement before any first DC scan
        ([([0], 0, 0, 1, 0)], r"DC refinement at Ah=1"),
        # AC before DC
        ([([0], 1, 63, 0, 0)], r"AC scan before the component's first DC"),
        # band scanned twice at the same level
        ([([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 1, 5, 0, 0)],
         r"overlaps an already-scanned band"),
        # skipped bit plane in refinement
        ([([0], 0, 0, 0, 2), ([0], 0, 0, 2, 0)],
         r"refinement must lower one bit plane"),
        # incomplete script at EOI (no AC coverage)
        ([([0], 0, 0, 0, 0)], r"scan script incomplete"),
        # incomplete: DC stops above plane 0
        ([([0], 0, 0, 0, 1), ([0], 1, 63, 0, 0)], r"scan script incomplete"),
    ]
    for scans, msg in cases:
        data = build_progressive(8, 8, _gray_comps(), q, blks, scans)
        with pytest.raises(ValueError, match=msg):
            decode_jpeg(data)


@st.composite
def _coef_case(draw):
    geom = draw(st.sampled_from(["gray", "444", "420"]))
    if geom == "gray":
        comps = [(1, 1, 1, 0)]
        width, height = draw(st.sampled_from([(8, 8), (24, 17), (16, 8)]))
    elif geom == "444":
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        width, height = draw(st.sampled_from([(8, 8), (17, 9)]))
    else:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        width, height = draw(st.sampled_from([(24, 16), (17, 9)]))
    g = _geometry(width, height, comps)
    blocks = []
    for ci in range(len(comps)):
        p = g["per"][ci]
        nb = p["bw_pad"] * p["bh_pad"]
        blks = [[0] * 64 for _ in range(nb)]
        n_entries = draw(st.integers(0, 10))
        for _ in range(n_entries):
            bi = draw(st.integers(0, nb - 1))
            k = draw(st.integers(0, 63))
            blks[bi][k] = draw(
                st.integers(-40, 40).filter(lambda x: x != 0)
            )
        blocks.append(blks)
    al = draw(st.integers(0, 2))
    split = draw(st.integers(1, 62))
    scans = [(list(range(len(comps))), 0, 0, 0, al)]
    for ci in range(len(comps)):
        scans.append(([ci], 1, split, 0, al))
        scans.append(([ci], split + 1, 63, 0, al))
    for plane in range(al, 0, -1):
        scans.append((list(range(len(comps))), 0, 0, plane, plane - 1))
        for ci in range(len(comps)):
            scans.append(([ci], 1, split, plane, plane - 1))
            scans.append(([ci], split + 1, 63, plane, plane - 1))
    return width, height, comps, blocks, scans


@settings(max_examples=25, deadline=None)
@given(_coef_case())
def test_progressive_property_equals_baseline(case):
    width, height, comps, blocks, scans = case
    qtables = {tq: _QT1 for _, _, _, tq in comps}
    base, prog = _decode_pair(width, height, comps, qtables, blocks, scans)
    assert prog.raw == base.raw


def test_progressive_through_universal_dispatch():
    from hbase_observer_es_spark.operators.jpeg import decode_image, sniff_format
    from hbase_observer_es_spark.operators.multimodal import decode_image_real

    blks = [_pad_blocks(1, {0: {0: 10, 1: -3}})]
    data = build_progressive(
        8, 8, _gray_comps(), {0: _QT1}, blks,
        [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
    )
    assert sniff_format(data) == "jpeg"
    assert decode_image(data).width == 8
    meta = decode_image_real(data)
    assert (meta["width"], meta["height"], meta["fmt"]) == (8, 8, "jpeg")


def test_progressive_restart_intervals_handpacked():
    """DRI=1 across a 2-block gray frame: RST0 between blocks in BOTH the
    DC scan (predictor reset: block1's diff is from 0, not block0) and
    the AC scan (EOB-run must not cross the boundary). Hand-packed.
    DC huffman: symbols {2,3} at length 2 → 2=00, 3=01.
    DC scan bits: block0 diff=5 cat3 → 01 101, pad 111 = 0x6F; RST0;
    block1 diff=-3 cat2 → 00 00, pad 1111 = 0x0F.
    AC huffman: {0x00} at length 1 → code 0.
    AC scan bits: EOB → 0, pad = 0x7F; RST0; EOB → 0x7F."""
    dqt = _seg(0xDB, bytes([0]) + bytes(_QT1))
    sof = _seg(0xC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    dri = _seg(0xDD, struct.pack(">H", 1))
    dht_dc = _seg(0xC4, b"\x00" + bytes([0, 2] + [0] * 14) + bytes([2, 3]))
    sos_dc = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    ecs_dc = bytes([0b01101111]) + b"\xff\xd0" + bytes([0b00001111])
    dht_ac = _seg(0xC4, b"\x10" + bytes([1] + [0] * 15) + bytes([0x00]))
    sos_ac = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    ecs_ac = bytes([0b01111111]) + b"\xff\xd0" + bytes([0b01111111])
    data = (
        b"\xff\xd8" + dqt + sof + dri
        + dht_dc + sos_dc + ecs_dc
        + dht_ac + sos_ac + ecs_ac
        + b"\xff\xd9"
    )
    img = decode_jpeg(data)
    blks = [_pad_blocks(2, {0: {0: 5}, 1: {0: -3}})]
    base = decode_jpeg(build_baseline(16, 8, _gray_comps(), {0: _QT1}, blks))
    assert img.raw == base.raw
    # broken restart ordering dies loudly (RST1 where RST0 is due)
    bad = data.replace(b"\xff\xd0" + bytes([0b00001111]),
                       b"\xff\xd1" + bytes([0b00001111]))
    with pytest.raises(ValueError, match=r"restart sequence broken"):
        decode_jpeg(bad)


def test_progressive_zero_component_scan_is_valueerror():
    """Regression (review finding): SOS with Ns=0 crashed with IndexError
    through the non-interleaved DC branch; the census error-fold only
    catches ValueError, so this was a task-killer on a corrupt corpus."""
    dqt = _seg(0xDB, bytes([0]) + bytes(_QT1))
    sof = _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht = _seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + bytes([0]))
    sos = _seg(0xDA, bytes([0, 0, 0, 0]))  # Ns=0, Ss=0, Se=0, AhAl=0
    data = b"\xff\xd8" + dqt + sof + dht + sos + b"\xff\xd9"
    with pytest.raises(ValueError, match=r"scan component count 0"):
        decode_jpeg(data)


def test_progressive_geometry_bomb_guard():
    """Regression (review finding): a ~20-byte SOF2 declaring 65535x65535
    must refuse BEFORE allocating the coefficient grids, per the
    codec-family header-geometry rule."""
    sof2 = _seg(0xC2, struct.pack(">BHHB", 8, 65535, 65535, 1)
                + bytes([1, 0x11, 0]))
    data = b"\xff\xd8" + sof2 + b"\xff\xd9"
    with pytest.raises(ValueError, match=r"pixel guard"):
        decode_jpeg(data)
    sof0 = _seg(0xC0, struct.pack(">BHHB", 8, 65535, 65535, 1)
                + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match=r"pixel guard"):
        decode_jpeg(b"\xff\xd8" + sof0 + b"\xff\xd9")


# --------------------------------------------- production progressive encoder


def test_encode_progressive_matches_baseline_pixels():
    """encode_jpeg_progressive carries the SAME quantized coefficients as
    encode_jpeg through the annex-G entropy structure, so both round
    trips reconstruct byte-identical pixels at every quality."""
    from hbase_observer_es_spark.operators.jpeg import (
        encode_jpeg, encode_jpeg_progressive,
    )
    from hbase_observer_es_spark.operators.png import PngImage

    cases = [
        PngImage(24, 17, 8, 0, 1, 24,
                 bytes((x * 7 + y * 3) % 256
                       for y in range(17) for x in range(24)), None),
        PngImage(16, 8, 8, 2, 3, 48,
                 bytes((x * 5 + y * 11 + c * 37) % 256
                       for y in range(8) for x in range(16)
                       for c in range(3)), None),
        # flat image: every AC block is zero → one EOB run spans ALL
        # blocks (the EOBn extension-bit path)
        PngImage(40, 24, 8, 0, 1, 40, bytes([77]) * 960, None),
    ]
    for img in cases:
        for q in (60, 85, 100):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog_bytes = encode_jpeg_progressive(img, quality=q)
            assert prog_bytes == encode_jpeg_progressive(img, quality=q)
            prog = decode_jpeg(prog_bytes)
            assert prog.raw == base.raw, (img.width, img.height, q)


def test_encode_progressive_is_sof2_and_dispatches():
    from hbase_observer_es_spark.operators.jpeg import (
        encode_jpeg_progressive, sniff_format,
    )
    from hbase_observer_es_spark.operators.multimodal import decode_image_real
    from hbase_observer_es_spark.operators.png import PngImage

    img = PngImage(8, 8, 8, 0, 1, 8, bytes(range(64)), None)
    data = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert sniff_format(data) == "jpeg"
    meta = decode_image_real(data)
    assert (meta["width"], meta["height"], meta["fmt"]) == (8, 8, "jpeg")


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_encode_progressive_property(w, h, seed):
    """Random geometry and content: progressive and baseline round trips
    reconstruct identical pixels (shared coefficients, disjoint entropy
    paths on BOTH sides now — encoder and decoder)."""
    import random

    from hbase_observer_es_spark.operators.jpeg import (
        encode_jpeg, encode_jpeg_progressive,
    )
    from hbase_observer_es_spark.operators.png import PngImage

    rng = random.Random(seed)
    raw = bytes(rng.randrange(256) for _ in range(w * h))
    img = PngImage(w, h, 8, 0, 1, w, raw, None)
    q = rng.choice((50, 85, 100))
    base = decode_jpeg(encode_jpeg(img, quality=q))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
    assert prog.raw == base.raw


def test_dc_predictor_out_of_range_is_loud():
    """A corrupt stream whose DC predictor accumulates past the 8-bit
    precision coefficient range (T.81 table F.1: ±2047) must raise the
    loud ValueError — never an int32 OverflowError from the flat
    coefficient store (ADVICE r12 allocation refactor)."""
    blocks = [_pad_blocks(2, {0: {0: 2000}, 1: {0: 4000}})]
    data = build_progressive(
        16, 8, _gray_comps(), {0: _QT1}, blocks, [([0], 0, 0, 0, 0)]
    )
    with pytest.raises(ValueError, match=r"DC predictor 4000 outside"):
        decode_jpeg(data)
