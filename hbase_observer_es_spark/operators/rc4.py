"""Shared RC4 primitive for the legacy-document DECRYPTION paths.

Two legacy formats ship RC4-protected payloads a crawled corpus hits
constantly: standard-security PDFs (``pdf_text.py``, ISO 32000-1
§7.6.3) and FILEPASS-encrypted BIFF8 workbooks (``xls_text.py``,
MS-OFFCRYPTO §2.3.6). Both need the same 20-line KSA/PRGA; one copy
keeps them from drifting (the ``textcodec.py`` lesson). Nothing here
ENCRYPTS new content — RC4 is long broken for that; these are readers
of legacy archives.
"""

from __future__ import annotations


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (public algorithm): encrypt == decrypt."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def rc4_keystream(key: bytes, n: int) -> bytes:
    """The first ``n`` keystream bytes (XOR-with-zeros form) — the
    skip-but-consume discipline the BIFF8 stream cipher needs."""
    return rc4(key, bytes(n))
