"""From-spec AES (FIPS-197) — the block cipher the modern encrypted-PDF
path needs (``pdf_text.py``: /AESV2 = AES-128-CBC, /AESV3 = AES-256-CBC;
the R6 password KDF also ENCRYPTS, so both directions are implemented).

No table transcription: the S-box and round constants are COMPUTED from
the GF(2^8) definitions (multiplicative inverse via 0x11B exp/log
tables + the affine transform), so a typo cannot hide in a 256-entry
literal — the FIPS-197 Appendix B/C known-answer vectors pin the whole
cipher in ``tests/test_aes.py``, and CBC round trips close the loop.

Python-speed note: this decrypts CENSUS-SIZED payloads (strings and
streams of crawled PDFs) inside mapInPandas tasks — tens of MB/s is
plenty there; nothing latency-critical routes through it. Nothing here
protects new data: AES appears solely as a READER of the public PDF
encryption formats.

Reference parity: none — builder-brief document-pipeline surface
(SURVEY §2-D), the cipher leg under ``pdf_text.py``'s standard
security handler.
"""

from __future__ import annotations


def _tables() -> tuple:
    # GF(2^8) exp/log over 0x11B with generator 3 (x+1)
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= ((x << 1) ^ (0x11B if x & 0x80 else 0)) & 0xFF
    for i in range(255, 510):
        exp[i] = exp[i - 255]

    def gmul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    sbox = [0] * 256
    inv_sbox = [0] * 256
    for c in range(256):
        v = 0 if c == 0 else exp[255 - log[c]]
        s, r = v, v
        for _ in range(4):  # affine transform: b ^= rot(b,1..4); ^ 0x63
            r = ((r << 1) | (r >> 7)) & 0xFF
            s ^= r
        s ^= 0x63
        sbox[c] = s
        inv_sbox[s] = c
    return sbox, inv_sbox, gmul


_SBOX, _INV_SBOX, _GMUL = _tables()


def _expand_key(key: bytes) -> list:
    """Round keys as a flat list of 4-byte words (FIPS-197 §5.2)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"aes: key length {len(key)} is not 16/24/32")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _GMUL(rcon, 2)
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return words


def _add_round_key(st: list, words: list, rnd: int) -> None:
    for c in range(4):
        w = words[4 * rnd + c]
        for r in range(4):
            st[r][c] ^= w[r]


def _encrypt_block(block: bytes, words: list, nr: int) -> bytes:
    st = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
    _add_round_key(st, words, 0)
    for rnd in range(1, nr + 1):
        for r in range(4):
            for c in range(4):
                st[r][c] = _SBOX[st[r][c]]
        for r in range(1, 4):  # ShiftRows
            st[r] = st[r][r:] + st[r][:r]
        if rnd < nr:  # MixColumns
            for c in range(4):
                a = [st[r][c] for r in range(4)]
                st[0][c] = _GMUL(a[0], 2) ^ _GMUL(a[1], 3) ^ a[2] ^ a[3]
                st[1][c] = a[0] ^ _GMUL(a[1], 2) ^ _GMUL(a[2], 3) ^ a[3]
                st[2][c] = a[0] ^ a[1] ^ _GMUL(a[2], 2) ^ _GMUL(a[3], 3)
                st[3][c] = _GMUL(a[0], 3) ^ a[1] ^ a[2] ^ _GMUL(a[3], 2)
        _add_round_key(st, words, rnd)
    return bytes(st[r][c] for c in range(4) for r in range(4))


def _decrypt_block(block: bytes, words: list, nr: int) -> bytes:
    st = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
    _add_round_key(st, words, nr)
    for rnd in range(nr - 1, -1, -1):
        for r in range(1, 4):  # InvShiftRows
            st[r] = st[r][-r:] + st[r][:-r]
        for r in range(4):
            for c in range(4):
                st[r][c] = _INV_SBOX[st[r][c]]
        _add_round_key(st, words, rnd)
        if rnd > 0:  # InvMixColumns
            for c in range(4):
                a = [st[r][c] for r in range(4)]
                st[0][c] = (_GMUL(a[0], 14) ^ _GMUL(a[1], 11)
                            ^ _GMUL(a[2], 13) ^ _GMUL(a[3], 9))
                st[1][c] = (_GMUL(a[0], 9) ^ _GMUL(a[1], 14)
                            ^ _GMUL(a[2], 11) ^ _GMUL(a[3], 13))
                st[2][c] = (_GMUL(a[0], 13) ^ _GMUL(a[1], 9)
                            ^ _GMUL(a[2], 14) ^ _GMUL(a[3], 11))
                st[3][c] = (_GMUL(a[0], 11) ^ _GMUL(a[1], 13)
                            ^ _GMUL(a[2], 9) ^ _GMUL(a[3], 14))
    return bytes(st[r][c] for c in range(4) for r in range(4))


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block, ECB — the FIPS-197 cipher proper."""
    if len(block) != 16:
        raise ValueError(f"aes: block length {len(block)} is not 16")
    return _encrypt_block(block, _expand_key(key), len(key) // 4 + 6)


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    if len(block) != 16:
        raise ValueError(f"aes: block length {len(block)} is not 16")
    return _decrypt_block(block, _expand_key(key), len(key) // 4 + 6)


def aes_ecb_decrypt(key: bytes, data: bytes) -> bytes:
    """Whole-buffer ECB decrypt with ONE key expansion (the ECMA-376
    Standard-encryption package path — per-block aes_decrypt_block
    calls would re-expand the schedule every 16 bytes)."""
    if len(data) % 16:
        raise ValueError(f"aes: ECB input of {len(data)} bytes not block-aligned")
    words = _expand_key(key)
    nr = len(key) // 4 + 6
    return b"".join(
        _decrypt_block(data[i : i + 16], words, nr)
        for i in range(0, len(data), 16)
    )


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, NO padding (the R6 KDF form): len(data) % 16 must be 0."""
    if len(data) % 16:
        raise ValueError(f"aes: CBC input of {len(data)} bytes not block-aligned")
    words = _expand_key(key)
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, words, nr)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, NO padding stripped (callers validate PDF's PKCS#5 layer
    themselves so the error can carry the object's origin)."""
    if len(data) % 16:
        raise ValueError(f"aes: CBC input of {len(data)} bytes not block-aligned")
    words = _expand_key(key)
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, words, nr), prev))
        prev = blk
    return bytes(out)
