"""LZFu / compressed-RTF decoder (MS-OXRTFCP) — the body format of
RTF-only Outlook ``.msg`` messages.

Outlook stores rich bodies as ``PidTagRtfCompressed`` (property
``0x1009``), a simple LZ77 stream from the public MS-OXRTFCP Open
Specification. Internal enterprise mail is frequently RTF-ONLY (no
plain-text ``0x1000`` twin), so a crawled corporate corpus hits this
constantly — the highest-leverage refusal left after round 15
(r15 VERDICT "What's missing" #2). The decompressed RTF routes through
the existing ``rtf_text.py`` extractor in ``msg_text.py``.

Wire format (MS-OXRTFCP §2.1):

* 16-byte header: ``COMPSIZE`` (u32le, bytes after this field),
  ``RAWSIZE`` (u32le, decompressed byte count), ``COMPTYPE``
  (``LZFu`` = compressed, ``MELA`` = stored), ``CRC`` (u32le over the
  bytes after the header — table-driven CRC32 polynomial 0xEDB88320
  with ZERO init and NO final inversion, unlike zlib's crc32; the
  spec's §2.1.3.2 table is exactly the classic CRC32 table);
* LZ77 body: control bytes of 8 LSB-first flags — 0 = literal byte,
  1 = a 16-bit BIG-endian dictionary reference of 12-bit offset +
  4-bit (length−2) into a 4096-byte CIRCULAR dictionary preloaded
  with the spec's 207-byte RTF-boilerplate seed (§2.1.2.1.2), write
  cursor starting at 207. A reference whose offset EQUALS the current
  write cursor is the end-of-stream marker, not a copy.

Strictness per the repo contract: size/CRC/termination mismatches and
truncations raise ValueError with byte offsets; ``RAWSIZE`` is checked
against the actual decompressed length, and ``max_output`` bounds
memory BEFORE any copy so a forged ``RAWSIZE`` cannot balloon.

``compress_lzfu`` is the production writer closing the round trip
(literal-only tokens — spec-valid by construction, the same
store-don't-rank posture as ``zstd.compress_zstd``); the decoder is
additionally pinned by an INDEPENDENT greedy-match encoder on the test
side plus the spec's own §3.1 worked example, byte for byte.

Reference parity: none — builder-brief document-pipeline surface
(SURVEY §2-D), the missing half of ``msg_text.py``'s body extraction.
"""

from __future__ import annotations

import struct

_MAGIC_LZ = 0x75465A4C  # "LZFu" little-endian
_MAGIC_RAW = 0x414C454D  # "MELA" little-endian

_DICT_SIZE = 4096

# the spec's initial dictionary (MS-OXRTFCP §2.1.2.1.2) — 207 bytes of
# RTF boilerplate so real RTF headers compress from the first byte
_SEED = (
    b"{\\rtf1\\ansi\\mac\\deff0\\deftab720{\\fonttbl;}{\\f0\\fnil "
    b"\\froman \\fswiss \\fmodern \\fscript \\fdecor MS Sans SerifSymbol"
    b"ArialTimes New RomanCourier{\\colortbl\\red0\\green0\\blue0\r\n"
    b"\\par \\pard\\plain\\f0\\fs20\\b\\i\\u\\tab\\tx"
)
assert len(_SEED) == 207


def _crc_table() -> list:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC = _crc_table()


def lzfu_crc(data: bytes) -> int:
    """MS-OXRTFCP §2.1.3.2 CRC: the classic CRC32 table with zero init
    and no output inversion (NOT zlib's crc32)."""
    crc = 0
    for b in data:
        crc = _CRC[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc


def decompress_lzfu(
    payload: bytes, origin: str = "<bytes>", max_output: int = 1 << 26
) -> bytes:
    """One PidTagRtfCompressed stream → the raw RTF bytes."""
    if len(payload) < 16:
        raise ValueError(
            f"lzfu {origin}: {len(payload)}-byte payload has no 16-byte "
            "header"
        )
    compsize, rawsize, comptype, crc = struct.unpack_from("<IIII", payload, 0)
    if compsize + 4 != len(payload):
        raise ValueError(
            f"lzfu {origin}: header declares {compsize} bytes after the "
            f"size field but the stream carries {len(payload) - 4}"
        )
    if rawsize > max_output:
        raise ValueError(
            f"lzfu {origin}: declared raw size {rawsize} exceeds the "
            f"{max_output}-byte budget"
        )
    body = payload[16:]
    if comptype == _MAGIC_RAW:
        if crc != 0:
            raise ValueError(
                f"lzfu {origin}: uncompressed (MELA) stream carries "
                f"nonzero CRC {crc:#010x} at byte 12"
            )
        if len(body) != rawsize:
            raise ValueError(
                f"lzfu {origin}: uncompressed stream carries {len(body)} "
                f"bytes but declares {rawsize}"
            )
        return body
    if comptype != _MAGIC_LZ:
        raise ValueError(
            f"lzfu {origin}: unknown COMPTYPE {comptype:#010x} at byte 8 "
            "(neither LZFu nor MELA)"
        )
    got = lzfu_crc(body)
    if got != crc:
        raise ValueError(
            f"lzfu {origin}: CRC mismatch at byte 12 (header says "
            f"{crc:#010x}, body hashes to {got:#010x})"
        )
    dictionary = bytearray(_DICT_SIZE)
    dictionary[: len(_SEED)] = _SEED
    wp = len(_SEED)
    out = bytearray()
    pos = 0
    n = len(body)
    ended = False
    while pos < n:
        control = body[pos]
        pos += 1
        for bit in range(8):
            if pos >= n:
                break
            if control >> bit & 1:  # dictionary reference
                if pos + 2 > n:
                    raise ValueError(
                        f"lzfu {origin}: dictionary reference truncated "
                        f"at body byte {pos}"
                    )
                ref = body[pos] << 8 | body[pos + 1]  # BIG-endian
                pos += 2
                offset = ref >> 4
                if offset == wp:  # end-of-stream marker
                    ended = True
                    break
                length = (ref & 0xF) + 2
                if len(out) + length > max_output:
                    raise ValueError(
                        f"lzfu {origin}: output exceeds the {max_output}"
                        f"-byte budget at body byte {pos - 2}"
                    )
                rp = offset
                for _ in range(length):
                    c = dictionary[rp]
                    rp = (rp + 1) % _DICT_SIZE
                    out.append(c)
                    dictionary[wp] = c
                    wp = (wp + 1) % _DICT_SIZE
            else:  # literal
                if len(out) + 1 > max_output:
                    raise ValueError(
                        f"lzfu {origin}: output exceeds the {max_output}"
                        f"-byte budget at body byte {pos}"
                    )
                c = body[pos]
                pos += 1
                out.append(c)
                dictionary[wp] = c
                wp = (wp + 1) % _DICT_SIZE
        if ended:
            break
    if not ended:
        raise ValueError(
            f"lzfu {origin}: body ends at byte {n} without the "
            "end-of-stream dictionary reference"
        )
    if len(out) != rawsize:
        raise ValueError(
            f"lzfu {origin}: decompressed {len(out)} bytes but the header "
            f"declares {rawsize}"
        )
    return bytes(out)


def compress_lzfu(data: bytes, stored: bool = False) -> bytes:
    """Deterministic spec-valid PidTagRtfCompressed stream — the
    production writer closing the round trip (``write_msg`` uses it for
    RTF-only fixtures; ``decompress_lzfu(compress_lzfu(x)) == x`` is
    pinned by test, against this decoder AND the independent test-side
    greedy encoder's streams the other way).

    ``stored=False`` emits literal-only LZFu tokens (ratio ~9/8 — the
    make-it-legal posture, not compression); ``stored=True`` emits the
    uncompressed MELA form."""
    if stored:
        return (
            struct.pack("<IIII", len(data) + 12, len(data), _MAGIC_RAW, 0)
            + data
        )
    n = len(data)
    end = (len(_SEED) + n) % _DICT_SIZE
    tokens = [(0, bytes([b])) for b in data]
    tokens.append((1, bytes([end >> 4, (end & 0xF) << 4])))
    body = bytearray()
    for g in range(0, len(tokens), 8):
        group = tokens[g : g + 8]
        control = 0
        for j, (flag, _) in enumerate(group):
            control |= flag << j
        body.append(control)
        for _, tb in group:
            body += tb
    return (
        struct.pack(
            "<IIII", len(body) + 12, n, _MAGIC_LZ, lzfu_crc(bytes(body))
        )
        + bytes(body)
    )
