"""Shared DECLARED-CODEPAGE decoding discipline for the legacy formats.

Three formats carry byte strings whose encoding is a Windows codepage
number declared elsewhere in the file (BIFF5/7 ``.xls`` CODEPAGE
records, ``.msg`` ``PidTagMessageCodepage``/``PidTagInternetCodepage``);
each used to hand-roll the same ``cp{N}`` lookup + refusal + strict
decode, and the copies had already drifted (xls special-cased 1200,
msg did not — the r15 review finding). ONE helper keeps the refusal
wording and the alias gaps identical everywhere:

* :func:`codepage_codec` — codepage number → codec name; a codepage
  Python has no decoder for refuses BY NAME (NotImplementedError);
  1200 (UTF-16, the "not a byte codepage" marker) is the caller's to
  special-case BEFORE calling, since its meaning is format-specific.
* :func:`strict_decode` — decode with NO replacement: an undecodable
  byte raises ValueError naming the byte, offset, and codec (the repo
  strict-decode contract).
"""

from __future__ import annotations

import codecs


def codepage_codec(cp: int, origin: str, fmt: str) -> str:
    """Codec name for a declared Windows codepage, or a loud by-name
    refusal when no decoder exists here."""
    name = f"cp{cp}"
    try:
        codecs.lookup(name)
    except LookupError:
        raise NotImplementedError(
            f"{fmt} {origin}: declared codepage {cp} has no decoder here "
            "— not implemented"
        ) from None
    return name


def strict_decode(raw: bytes, codec: str, origin: str, what: str, fmt: str) -> str:
    """Byte string → text with the strict contract: never U+FFFD."""
    try:
        return raw.decode(codec)
    except UnicodeDecodeError as exc:
        raise ValueError(
            f"{fmt} {origin}: {what} byte {exc.start} "
            f"({raw[exc.start]:#04x}) not decodable as {codec}"
        ) from None
