"""TIFF from the public TIFF 6.0 structure, stdlib-only.

Scanned-document corpora carry TIFFs. The container is an IFD walk
(both byte orders), and the baseline subset decodes for real — 8-bit
grayscale (both photometric polarities) and RGB(A), strips uncompressed
OR LZW-compressed (TIFF 6.0 §13: MSB-first, EarlyChange width growth,
per-strip CLEAR; r12) with the §14 horizontal-differencing predictor —
strip-assembled into a :class:`~.png.PngImage` so the whole pixel stack
composes. PackBits RLE and Deflate strips decode too (stdlib zlib,
bounded-inflate), and since r13 the bilevel fax family decodes for
real — Modified Huffman (compression 2), Group 3 (compression 3, 1-D
and the T4Options 2-D variant), and Group 4 (compression 4) through
the from-spec ITU-T T.4/T.6 decoder (``operators/ccittfax.py``), with
FillOrder 2 bit reversal and photometric polarity honored. New-style
JPEG-in-TIFF (compression 7) decodes through the from-spec JPEG
decoder with the JPEGTables-tag splice (r13); old-style JPEG
(compression 6, deprecated since TTN2) decodes since r16 when it
carries the JPEGInterchangeFormat stream (tags 513/514 — the one form
TTN2 blessed), while the unimplementable-as-specified bare-entropy
strip layout (tags 519-521) refuses BY NAME. ``tiff_meta``
still reports every variant's geometry and compression so curation can
filter without decoding. BigTIFF (magic 43, the 8-byte-offset layout)
and tile-organized baseline codecs DECODE for real since r13
(LONG8/SLONG8/IFD8 entry types, 16-byte header; ``_assemble_tiles``);
r15 extends the tile walk to fax AND JPEG tiles (each tile an
independently coded full-sized image per TIFF 6.0 §15, crop-copied
through the shared ``_tile_grid``/``_crop_copy_tile`` pair), so the
whole compression zoo now decodes in both strip and tile organization.

Guards per the codec-family rule: IFD offsets and entry counts are
attacker data — an offset outside the file, a strip that overruns, an
IFD loop (offset repeating), or a geometry/strip-bytes mismatch names
its offset; ``origin`` context everywhere.

Reference parity: none — builder-brief multimodal surface, SURVEY §2-D.
"""

from __future__ import annotations

import struct

from .png import PngImage

_TYPE_SIZES = {
    1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
    16: 8, 17: 8, 18: 8,  # BigTIFF LONG8 / SLONG8 / IFD8
}

_COMPRESSION_NAMES = {
    2: "ccitt-rle", 3: "ccitt-g3-fax", 4: "ccitt-g4-fax", 5: "lzw",
    6: "old-jpeg", 7: "jpeg", 8: "deflate", 32773: "packbits",
    32946: "deflate (legacy tag)",
}


_BIG_MAGICS = (b"II+\x00", b"MM\x00+")


def looks_like_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*") or payload[:4] in _BIG_MAGICS


def _read_entries(
    data: bytes, ifd_at: int, endian: str, origin: str, big: bool = False
) -> dict:
    """One IFD → ({tag: values}, next-IFD offset). Classic layout: 2-byte
    entry count, 12-byte entries, 4-byte inline values and offsets.
    BigTIFF (``big``): 8-byte count, 20-byte entries, 8-byte inline
    values/offsets, plus the LONG8/SLONG8/IFD8 field types."""
    head, esize, inline = (8, 20, 8) if big else (2, 12, 4)
    if ifd_at + head > len(data):
        raise ValueError(f"tiff {origin}: IFD at byte {ifd_at} truncated")
    (n,) = struct.unpack(
        endian + ("Q" if big else "H"), data[ifd_at : ifd_at + head]
    )
    end = ifd_at + head + n * esize
    if end + inline > len(data):
        raise ValueError(
            f"tiff {origin}: IFD at byte {ifd_at} declares {n} entries, "
            "overrunning the file"
        )
    entries = {}
    for i in range(n):
        e = ifd_at + head + i * esize
        if big:
            tag, typ, count = struct.unpack(endian + "HHQ", data[e : e + 12])
            vstart = e + 12
        else:
            tag, typ, count = struct.unpack(endian + "HHI", data[e : e + 8])
            vstart = e + 8
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown field type: spec says skip
        total = size * count
        if total <= inline:
            raw = data[vstart : vstart + total]
        else:
            (off,) = struct.unpack(
                endian + ("Q" if big else "I"),
                data[vstart : vstart + inline],
            )
            if off + total > len(data):
                raise ValueError(
                    f"tiff {origin}: tag {tag} value at byte {off} overruns "
                    "the file"
                )
            raw = data[off : off + total]
        if typ in (3, 8):
            vals = list(struct.unpack(f"{endian}{count}H", raw))
        elif typ in (4, 9):
            vals = list(struct.unpack(f"{endian}{count}I", raw))
        elif typ in (16, 18):  # BigTIFF LONG8 / IFD8
            vals = list(struct.unpack(f"{endian}{count}Q", raw))
        elif typ == 17:  # BigTIFF SLONG8
            vals = list(struct.unpack(f"{endian}{count}q", raw))
        elif typ in (1, 6, 7, 2):
            vals = list(raw)
        else:  # rationals: keep exact numerator/denominator pairs
            nums = struct.unpack(f"{endian}{2 * count}I", raw)
            vals = [(nums[2 * k], nums[2 * k + 1]) for k in range(count)]
        entries[tag] = vals
    (next_ifd,) = struct.unpack(
        endian + ("Q" if big else "I"), data[end : end + inline]
    )
    return entries, next_ifd


def _walk_ifds(data: bytes, origin: str):
    if not looks_like_tiff(data):
        raise ValueError(
            f"tiff {origin}: not a TIFF stream (bytes 0-3 {data[:4]!r})"
        )
    big = data[:4] in _BIG_MAGICS
    endian = "<" if data[:2] == b"II" else ">"
    if big:
        # BigTIFF header: magic 43, offset bytesize (8), a zero pad
        # word, then the 8-byte first-IFD offset
        if len(data) < 16:
            raise ValueError(
                f"tiff {origin}: {len(data)}-byte payload is too short "
                "for a BigTIFF header"
            )
        osize, pad = struct.unpack(endian + "HH", data[4:8])
        if osize != 8 or pad != 0:
            raise ValueError(
                f"tiff {origin}: BigTIFF offset size {osize}/pad {pad} "
                "invalid (must be 8/0)"
            )
        (ifd_at,) = struct.unpack(endian + "Q", data[8:16])
    else:
        if len(data) < 8:
            raise ValueError(
                f"tiff {origin}: {len(data)}-byte payload is too short "
                "for a TIFF header"
            )
        (ifd_at,) = struct.unpack(endian + "I", data[4:8])
    seen = set()
    while ifd_at:
        if ifd_at in seen:
            raise ValueError(
                f"tiff {origin}: IFD chain loops back to byte {ifd_at}"
            )
        seen.add(ifd_at)
        entries, ifd_at = _read_entries(data, ifd_at, endian, origin, big)
        yield entries


def _first(entries: dict, tag: int, default=None):
    v = entries.get(tag)
    return v[0] if v else default


def tiff_meta(data: bytes, origin: str = "<bytes>") -> dict:
    """Per-file facts from the first IFD + the page count: geometry,
    bits/sample, compression (named), photometric, endianness. No pixel
    data touched."""
    pages = 0
    first = None
    for entries in _walk_ifds(data, origin):
        if first is None:
            first = entries
        pages += 1
    if first is None:
        raise ValueError(f"tiff {origin}: no IFD in the chain")
    comp = _first(first, 259, 1)
    bits = first.get(258, [1])
    return {
        "width": _first(first, 256, 0),
        "height": _first(first, 257, 0),
        "bits_per_sample": max(bits),
        "samples_per_pixel": _first(first, 277, 1),
        "compression": "none" if comp == 1 else _COMPRESSION_NAMES.get(comp, f"tag {comp}"),
        "photometric": _first(first, 262, 0),
        "n_pages": pages,
        "big_endian": data[:2] == b"MM",
        "bigtiff": data[:4] in _BIG_MAGICS,
    }


def _lzw_decode_msb(data: bytes, expected: int | None, origin: str,
                    strip: int, kind: str = "tiff",
                    early_change: bool = True,
                    max_out: int = 1 << 26) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first bit packing, fixed 8-bit
    symbols, CLEAR=256, EOI=257, code width 9→12 growing EARLY (when the
    next table index is 2^width − 1, the spec's historic EarlyChange
    convention), every strip's stream starts with CLEAR. Structurally the
    MSB/EarlyChange variant of ``gif._lzw_decode`` — the bit packing
    direction, symbol width, and growth trigger are spec-level different
    between the two formats, so each codec carries its own loop; fix
    dictionary-handling bugs in BOTH. With ``expected`` set (TIFF strips)
    exactly that many bytes come out, more or fewer is loud; PDF's
    LZWDecode reuses this exact coding with ``expected=None`` (no
    declared size — ``max_out`` is the bomb bound) and, rarely,
    ``early_change=False`` (DecodeParms /EarlyChange 0)."""
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    CLEAR, EOI = 256, 257

    def base():
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = base()
    width = 9
    prev = None
    first = True
    while True:
        if bitpos + width > nbits:
            raise ValueError(
                f"{kind} {origin}: LZW strip {strip} ends without EOI"
            )
        byte = bitpos >> 3
        chunk = 0
        for i in range(3):  # MSB-first window across up to 3 bytes
            chunk = (chunk << 8) | (
                data[byte + i] if byte + i < len(data) else 0
            )
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if first and code != CLEAR:
            raise ValueError(
                f"{kind} {origin}: LZW strip {strip} does not start with "
                "CLEAR (the spec requires it)"
            )
        first = False
        if code == CLEAR:
            table = base()
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError(
                    f"{kind} {origin}: LZW strip {strip}: first code after "
                    f"CLEAR is {code}, not a literal"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError(
                f"{kind} {origin}: LZW strip {strip}: code {code} beyond "
                f"dictionary size {len(table)} — corrupt stream"
            )
        out += entry
        if len(out) > (expected if expected is not None else max_out):
            raise ValueError(
                f"{kind} {origin}: LZW strip {strip} inflates past "
                + (f"the {expected} bytes its geometry declares"
                   if expected is not None else f"the {max_out}-byte bound")
            )
        prev = entry
        grow_at = (1 << width) - (1 if early_change else 0)
        if len(table) == grow_at and width < 12:
            width += 1  # EarlyChange: one index before the LSB-first rule
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"{kind} {origin}: LZW strip {strip} produced {len(out)} of "
            f"{expected} bytes"
        )
    return bytes(out)


def _packbits_decode(data: bytes, expected: int, origin: str, strip: int) -> bytes:
    """PackBits (TIFF 6.0 §9, the Apple RLE): control byte n → n in
    0..127 copies the next n+1 literals, n in -127..-1 repeats the next
    byte 1−n times, −128 is a no-op. Exactly ``expected`` bytes out."""
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError(
                f"tiff {origin}: packbits strip {strip} ends mid-stream "
                f"({len(out)} of {expected} bytes)"
            )
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n == -128:
            continue
        if n >= 0:
            if i + n + 1 > len(data):
                raise ValueError(
                    f"tiff {origin}: packbits strip {strip} literal run "
                    "overruns the stream"
                )
            out += data[i : i + n + 1]
            i += n + 1
        else:
            if i >= len(data):
                raise ValueError(
                    f"tiff {origin}: packbits strip {strip} repeat run "
                    "overruns the stream"
                )
            out += bytes([data[i]]) * (1 - n)
            i += 1
        if len(out) > expected:
            raise ValueError(
                f"tiff {origin}: packbits strip {strip} inflates past the "
                f"{expected} bytes its geometry declares"
            )
    return bytes(out)


def _deflate_decode(data: bytes, expected: int, origin: str, strip: int) -> bytes:
    """Deflate strips (compression 8, and the legacy 32946): zlib
    streams, bounded-inflated to exactly the declared size — the png.py
    decompression-bomb discipline."""
    import zlib

    d = zlib.decompressobj()
    try:
        out = d.decompress(data, expected)
    except zlib.error as e:
        raise ValueError(
            f"tiff {origin}: deflate strip {strip} is not a zlib stream "
            f"({e})"
        ) from None
    if d.unconsumed_tail or d.flush():
        raise ValueError(
            f"tiff {origin}: deflate strip {strip} inflates past the "
            f"{expected} bytes its geometry declares"
        )
    if len(out) != expected:
        raise ValueError(
            f"tiff {origin}: deflate strip {strip} produced {len(out)} of "
            f"{expected} bytes"
        )
    return out


def _undo_predictor2(chunk: bytes, rows: int, width: int, spp: int) -> bytes:
    """Predictor 2 (horizontal differencing, tag 317): each sample stores
    the delta to the sample one PIXEL left in the same channel; undo is a
    per-row running sum mod 256."""
    out = bytearray(chunk)
    row_bytes = width * spp
    for r in range(rows):
        base = r * row_bytes
        for i in range(base + spp, base + row_bytes):
            out[i] = (out[i] + out[i - spp]) & 0xFF
    return bytes(out)


def _decode_ccitt_tiff(
    data: bytes, entries: dict, comp: int, origin: str
) -> PngImage:
    """Bilevel fax strips (compressions 2/3/4) through the ITU-T T.4 /
    T.6 decoder (``operators/ccittfax.py``, r13). One bit per sample,
    one sample per pixel; decoded white/black expands to 8-bit gray
    through the photometric tag (0 = WhiteIsZero, the fax default)."""
    from .ccittfax import decode_ccitt

    w = _first(entries, 256, 0)
    h = _first(entries, 257, 0)
    if w < 1 or h < 1:
        raise ValueError(f"tiff {origin}: geometry {w}x{h} invalid")
    bits = entries.get(258, [1])
    spp = _first(entries, 277, 1)
    if bits != [1] or spp != 1:
        raise ValueError(
            f"tiff {origin}: CCITT fax requires 1 bit/sample, 1 "
            f"sample/pixel — got bits {bits}, spp {spp}"
        )
    photometric = _first(entries, 262, 0)
    if photometric not in (0, 1):
        raise ValueError(
            f"tiff {origin}: photometric {photometric} invalid for "
            "bilevel fax (WhiteIsZero/BlackIsZero only)"
        )
    if _first(entries, 317, 1) != 1:
        raise ValueError(
            f"tiff {origin}: a predictor on CCITT strips is malformed"
        )
    if comp == 2:
        mode = "mh"
    elif comp == 3:
        t4 = _first(entries, 292, 0)
        if t4 & 2:
            raise NotImplementedError(
                f"tiff {origin}: T4Options declares UNCOMPRESSED mode "
                "(bit 1) — the T.4 optional extension is not implemented"
            )
        mode = "g3-2d" if t4 & 1 else "g3"
    else:
        t6 = _first(entries, 293, 0)
        if t6 & 2:
            raise NotImplementedError(
                f"tiff {origin}: T6Options declares UNCOMPRESSED mode "
                "(bit 1) — the T.6 optional extension is not implemented"
            )
        mode = "g4"
    fill_order = _first(entries, 266, 1)
    if 322 in entries:
        # tile-organized fax (r15 — previously refused by name): each
        # tile is an INDEPENDENTLY coded full-sized tile_w x tile_h fax
        # image (TIFF 6.0 §15); decode and crop-copy like the byte codecs
        tile_w, tile_h, offsets, counts, across = _tile_grid(
            entries, w, h, origin
        )
        raw = bytearray(w * h)
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError(
                    f"tiff {origin}: tile {ti} at byte {off} overruns "
                    "the file"
                )
            chunk = decode_ccitt(
                data[off : off + cnt], tile_w, tile_h, mode, origin,
                fill_order=fill_order, strip=ti,
            )
            _crop_copy_tile(raw, chunk, ti, across, tile_w, tile_h, w, h, 1)
    else:
        offsets = entries.get(273)
        counts = entries.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError(
                f"tiff {origin}: strip offsets/byte-counts missing or mismatched"
            )
        rows_per_strip = _first(entries, 278, h)
        raw = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError(
                    f"tiff {origin}: strip {si} at byte {off} overruns the file"
                )
            rows_here = min(rows_per_strip, h - si * rows_per_strip)
            if rows_here <= 0:
                raise ValueError(
                    f"tiff {origin}: strip {si} lies beyond the declared "
                    f"{h}-row geometry"
                )
            raw += decode_ccitt(
                data[off : off + cnt], w, rows_here, mode, origin,
                fill_order=fill_order, strip=si,
            )
        if len(raw) != w * h:
            raise ValueError(
                f"tiff {origin}: fax strips assemble {len(raw)} pixels, "
                f"geometry needs {w * h}"
            )
    # bit 0 is the coded "white": photometric 0 (WhiteIsZero) shows it
    # at full brightness, photometric 1 inverts
    table = (
        bytes([255, 0]) if photometric == 0 else bytes([0, 255])
    ) + bytes(254)
    return PngImage(w, h, 8, 0, 1, w, bytes(raw).translate(table), None)


def _decode_oldjpeg_tiff(data: bytes, entries: dict, origin: str) -> PngImage:
    """Old-style JPEG-in-TIFF (compression 6, deprecated since TTN2).

    The form that exists in the wild — and the only one TTN2 §3
    retroactively blessed — frames ONE complete interchange JPEG
    stream for the whole image via JPEGInterchangeFormat (tag 513) +
    JPEGInterchangeFormatLength (tag 514); it decodes here through the
    from-spec T.81 decoder with the image geometry cross-checked
    against the IFD. The fragment form that scatters bare entropy
    segments across strips with JPEGQTables/JPEGDCTables/JPEGACTables
    (tags 519-521) and no SOI/SOS framing is the part TTN2 §2 declares
    unimplementable-as-specified — it refuses BY NAME rather than
    guess at the undefined strip framing."""
    from .jpeg import JPEG_MAGIC, decode_jpeg

    w = _first(entries, 256, 0)
    h = _first(entries, 257, 0)
    if w < 1 or h < 1:
        raise ValueError(f"tiff {origin}: geometry {w}x{h} invalid")
    off = _first(entries, 513)
    if off is None:
        raise NotImplementedError(
            f"tiff {origin}: old-style JPEG (compression 6) without a "
            "JPEGInterchangeFormat stream — the per-strip bare-entropy "
            "layout (tags 519-521) is unimplementable as specified "
            "(TTN2 §2) and not supported (refused by name)"
        )
    length = _first(entries, 514)
    if length is None:
        # TTN2 notes writers that omitted the length; the stream runs
        # to the file end and the JPEG decoder's own EOI framing bounds
        # it
        length = len(data) - off
    if off + length > len(data) or length < 4:
        raise ValueError(
            f"tiff {origin}: JPEGInterchangeFormat at byte {off} declares "
            f"{length} bytes past the file end"
        )
    seg = bytes(data[off : off + length])
    if seg[:2] != JPEG_MAGIC:
        raise ValueError(
            f"tiff {origin}: JPEGInterchangeFormat at byte {off} does "
            "not start with SOI"
        )
    img = decode_jpeg(seg, f"{origin} interchange stream")
    if (img.width, img.height) != (w, h):
        raise ValueError(
            f"tiff {origin}: interchange JPEG decodes {img.width}x"
            f"{img.height}, the IFD declares {w}x{h}"
        )
    return img


def _decode_jpeg_tiff(data: bytes, entries: dict, origin: str) -> PngImage:
    """New-style JPEG-in-TIFF (compression 7, the TIFF-EP layout): each
    strip is a complete JPEG stream, optionally relying on the shared
    JPEGTables tag (347) — an abbreviated SOI…EOI stream whose segments
    (DQT/DHT/DRI) splice in after every strip's SOI before the from-spec
    JPEG decoder (``operators/jpeg.py``) runs. Old-style JPEG
    (compression 6) routes through ``_decode_oldjpeg_tiff``."""
    from .jpeg import JPEG_MAGIC, decode_jpeg

    w = _first(entries, 256, 0)
    h = _first(entries, 257, 0)
    if w < 1 or h < 1:
        raise ValueError(f"tiff {origin}: geometry {w}x{h} invalid")
    photometric = _first(entries, 262, 1)
    if photometric not in (1, 2, 6):
        raise ValueError(
            f"tiff {origin}: photometric {photometric} unsupported for "
            "JPEG strips (grayscale/RGB/YCbCr only)"
        )
    tables_body = b""
    tables = entries.get(347)
    if tables:
        tb = bytes(tables)
        if tb[:2] != JPEG_MAGIC or tb[-2:] != b"\xff\xd9":
            raise ValueError(
                f"tiff {origin}: JPEGTables is not an SOI…EOI abbreviated "
                f"stream (starts {tb[:2]!r}, ends {tb[-2:]!r})"
            )
        tables_body = tb[2:-2]
    def _tile_jpeg(seg: bytes, ti: int, want_w: int, want_h: int):
        if seg[:2] != JPEG_MAGIC:
            raise ValueError(
                f"tiff {origin}: JPEG segment {ti} does not start with SOI"
            )
        img = decode_jpeg(
            JPEG_MAGIC + tables_body + seg[2:], f"{origin} strip {ti}"
        )
        if (img.width, img.height) != (want_w, want_h):
            raise ValueError(
                f"tiff {origin}: JPEG segment {ti} decodes {img.width}x"
                f"{img.height}, the geometry needs {want_w}x{want_h}"
            )
        return img

    channels = None

    def _check_channels(img, ti: int) -> int:
        nonlocal channels
        if channels is None:
            channels = img.channels
        elif img.channels != channels:
            raise ValueError(
                f"tiff {origin}: JPEG segment {ti} has {img.channels} "
                f"channels, segment 0 had {channels}"
            )
        return channels

    if 322 in entries:
        # tile-organized JPEG (r15 — previously refused by name): each
        # tile is a complete tile_w x tile_h JPEG stream, optionally
        # sharing the JPEGTables segments, crop-copied like the byte
        # codecs
        tile_w, tile_h, offsets, counts, across = _tile_grid(
            entries, w, h, origin
        )
        raw = None
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError(
                    f"tiff {origin}: tile {ti} at byte {off} overruns "
                    "the file"
                )
            img = _tile_jpeg(data[off : off + cnt], ti, tile_w, tile_h)
            spp = _check_channels(img, ti)
            if raw is None:
                raw = bytearray(w * h * spp)
            _crop_copy_tile(raw, img.raw, ti, across, tile_w, tile_h, w, h, spp)
    else:
        offsets = entries.get(273)
        counts = entries.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError(
                f"tiff {origin}: strip offsets/byte-counts missing or mismatched"
            )
        rows_per_strip = _first(entries, 278, h)
        raw = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError(
                    f"tiff {origin}: strip {si} at byte {off} overruns the file"
                )
            rows_here = min(rows_per_strip, h - si * rows_per_strip)
            if rows_here <= 0:
                raise ValueError(
                    f"tiff {origin}: strip {si} lies beyond the declared "
                    f"{h}-row geometry"
                )
            img = _tile_jpeg(data[off : off + cnt], si, w, rows_here)
            _check_channels(img, si)
            raw += img.raw
    if channels == 3:
        return PngImage(w, h, 8, 2, 3, w * 3, bytes(raw), None)
    return PngImage(w, h, 8, 0, 1, w, bytes(raw), None)


def _tile_grid(entries: dict, w: int, h: int, origin: str):
    """Validated tile layout (tags 322/323/324/325): returns
    ``(tile_w, tile_h, offsets, counts, across)``. Shared by the
    byte-codec, fax, and JPEG tile paths so the grid arithmetic and its
    error surface exist once."""
    tile_w = _first(entries, 322, 0)
    tile_h = _first(entries, 323, 0)
    if tile_w < 1 or tile_h < 1:
        raise ValueError(
            f"tiff {origin}: tile geometry {tile_w}x{tile_h} invalid"
        )
    offsets = entries.get(324)
    counts = entries.get(325)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError(
            f"tiff {origin}: tile offsets/byte-counts missing or mismatched"
        )
    across = -(-w // tile_w)
    down = -(-h // tile_h)
    if len(offsets) != across * down:
        raise ValueError(
            f"tiff {origin}: {len(offsets)} tiles declared, the "
            f"{w}x{h}/{tile_w}x{tile_h} grid needs {across * down}"
        )
    return tile_w, tile_h, offsets, counts, across


def _crop_copy_tile(
    raw: bytearray, chunk, ti: int, across: int,
    tile_w: int, tile_h: int, w: int, h: int, spp: int,
) -> None:
    """Paste one full-sized decoded tile into the raster, cropping the
    right/bottom padding of edge tiles (TIFF 6.0 §15)."""
    tile_row = tile_w * spp
    row_bytes = w * spp
    ty, tx = divmod(ti, across)
    x0 = tx * tile_row
    rows_here = min(tile_h, h - ty * tile_h)
    cols_bytes = min(tile_row, row_bytes - x0)
    for r in range(rows_here):
        dst = (ty * tile_h + r) * row_bytes + x0
        src = r * tile_row
        raw[dst : dst + cols_bytes] = chunk[src : src + cols_bytes]


def _assemble_tiles(
    data: bytes, entries: dict, comp: int, predictor: int,
    w: int, h: int, spp: int, origin: str,
) -> bytearray:
    """Tile-organized pixel data (tags 322/323/324/325, TIFF 6.0 §15):
    the image is a grid of ``tile_w × tile_h`` tiles in row-major order,
    every tile FULL-SIZED (edge tiles padded right/bottom) — decode each,
    undo the predictor at tile width, then crop-copy into the raster.
    Tiled files are how large scans ship (one tile decodes without the
    whole row of strips), so the 100 TB read path wants them first-class,
    not refused."""
    tile_w, tile_h, offsets, counts, across = _tile_grid(entries, w, h, origin)
    tile_bytes = tile_w * tile_h * spp
    raw = bytearray(h * w * spp)
    for ti, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError(
                f"tiff {origin}: tile {ti} at byte {off} overruns the file"
            )
        seg = data[off : off + cnt]
        if comp == 1:
            if cnt != tile_bytes:
                raise ValueError(
                    f"tiff {origin}: tile {ti} carries {cnt} bytes but a "
                    f"full tile needs {tile_bytes}"
                )
            chunk = seg
        elif comp == 5:
            chunk = _lzw_decode_msb(seg, tile_bytes, origin, ti)
        elif comp == 32773:
            chunk = _packbits_decode(seg, tile_bytes, origin, ti)
        else:  # 8 / 32946
            chunk = _deflate_decode(seg, tile_bytes, origin, ti)
        if predictor == 2:
            chunk = _undo_predictor2(chunk, tile_h, tile_w, spp)
        _crop_copy_tile(raw, chunk, ti, across, tile_w, tile_h, w, h, spp)
    return raw


def decode_tiff(data: bytes, origin: str = "<bytes>") -> PngImage:
    """Real decode of the baseline subset (first page): 8-bit grayscale
    (photometric 0 inverted per spec, 1 as-is) and 8-bit RGB(A, alpha
    dropped — the corpus convention, as in the perceptual hashes), strips
    uncompressed, LZW (with horizontal-differencing predictor 2),
    PackBits RLE, or Deflate; bilevel CCITT fax (MH/G3/G4) routes to
    the T.4/T.6 decoder and new-style JPEG strips to the T.81 decoder.
    Strips are validated against the declared geometry; old-style JPEG
    (compression 6) decodes via its JPEGInterchangeFormat stream, with
    the bare-entropy strip layout refusing by name."""
    entries = next(_walk_ifds(data, origin), None)
    if entries is None:
        raise ValueError(f"tiff {origin}: no IFD in the chain")
    comp = _first(entries, 259, 1)
    if comp in (2, 3, 4):
        return _decode_ccitt_tiff(data, entries, comp, origin)
    if comp == 6:
        return _decode_oldjpeg_tiff(data, entries, origin)
    if comp == 7:
        return _decode_jpeg_tiff(data, entries, origin)
    if comp not in (1, 5, 8, 32773, 32946):
        name = _COMPRESSION_NAMES.get(comp, f"tag {comp}")
        raise ValueError(
            f"tiff {origin}: {name} compression unsupported for decode "
            "(uncompressed/LZW/deflate/packbits/CCITT/JPEG baseline "
            "only; tiff_meta still reports geometry)"
        )
    predictor = _first(entries, 317, 1)
    if predictor not in (1, 2):
        raise ValueError(
            f"tiff {origin}: predictor {predictor} unsupported "
            "(none or horizontal differencing)"
        )
    if predictor == 2 and comp not in (5, 8, 32946):
        raise ValueError(
            f"tiff {origin}: predictor 2 outside LZW/deflate compression "
            "is malformed (TIFF 6.0 §14 ties the predictor to the "
            "dictionary codecs)"
        )
    w = _first(entries, 256, 0)
    h = _first(entries, 257, 0)
    if w < 1 or h < 1:
        raise ValueError(f"tiff {origin}: geometry {w}x{h} invalid")
    spp = _first(entries, 277, 1)
    bits = entries.get(258, [1])
    if any(b != 8 for b in bits):
        raise ValueError(
            f"tiff {origin}: bits/sample {bits} unsupported for decode "
            "(8-bit baseline only)"
        )
    photometric = _first(entries, 262, 1)
    if photometric not in (0, 1, 2):
        raise ValueError(
            f"tiff {origin}: photometric {photometric} unsupported "
            "(grayscale/RGB only)"
        )
    if photometric == 2 and spp < 3:
        raise ValueError(
            f"tiff {origin}: RGB with {spp} samples/pixel is malformed"
        )
    row_bytes = w * spp
    if 322 in entries:
        raw = _assemble_tiles(data, entries, comp, predictor, w, h, spp, origin)
    else:
        offsets = entries.get(273)
        counts = entries.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError(
                f"tiff {origin}: strip offsets/byte-counts missing or "
                "mismatched"
            )
        rows_per_strip = _first(entries, 278, h)
        raw = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError(
                    f"tiff {origin}: strip {si} at byte {off} overruns the file"
                )
            rows_here = min(rows_per_strip, h - si * rows_per_strip)
            if rows_here <= 0:
                # more strips declared than ceil(h / rows_per_strip): without
                # this, a negative expected size leaks a bare zlib error out
                # of the deflate path instead of an origin-prefixed refusal
                raise ValueError(
                    f"tiff {origin}: strip {si} lies beyond the declared "
                    f"{h}-row geometry"
                )
            if comp != 1:
                seg = data[off : off + cnt]
                need = rows_here * row_bytes
                if comp == 5:
                    chunk = _lzw_decode_msb(seg, need, origin, si)
                elif comp == 32773:
                    chunk = _packbits_decode(seg, need, origin, si)
                else:  # 8 / 32946
                    chunk = _deflate_decode(seg, need, origin, si)
                if predictor == 2:
                    chunk = _undo_predictor2(chunk, rows_here, w, spp)
                raw += chunk
                continue
            if cnt != rows_here * row_bytes:
                raise ValueError(
                    f"tiff {origin}: strip {si} carries {cnt} bytes but the "
                    f"geometry needs {rows_here * row_bytes}"
                )
            raw += data[off : off + cnt]
    if len(raw) != h * row_bytes:
        raise ValueError(
            f"tiff {origin}: strips assemble {len(raw)} bytes, geometry "
            f"needs {h * row_bytes}"
        )
    if photometric == 2:
        if spp > 3:  # drop extra samples (alpha) per the corpus convention
            out = bytearray(w * h * 3)
            for c in range(3):  # three C-speed strided copies, no per-pixel loop
                out[c::3] = raw[c::spp]
            raw = out
        return PngImage(w, h, 8, 2, 3, w * 3, bytes(raw), None)
    if spp != 1:
        raise ValueError(
            f"tiff {origin}: grayscale with {spp} samples/pixel unsupported"
        )
    if photometric == 0:  # WhiteIsZero: invert to the usual polarity
        raw = bytes(raw).translate(bytes(255 - i for i in range(256)))
    return PngImage(w, h, 8, 0, 1, w, bytes(raw), None)
