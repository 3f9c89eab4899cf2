"""Adobe Glyph List core subset: PostScript glyph name → Unicode text.

PDF simple fonts may carry an /Encoding dict with a /Differences array
remapping byte codes to GLYPH NAMES — every pdfTeX-produced font does
(the most common refusal a TeX corpus hits, per the round-12 verdict).
The name→character mapping is published as Adobe's Glyph List (AGL) and
its application algorithm (the aglfn specification); this module
implements the core subset with one hard verification rule:

**every mapping is derived through ``unicodedata.lookup`` by the
character's official Unicode NAME, never transcribed as a hex
codepoint.** The Unicode Character Database inside the stdlib is the
independent in-container oracle — a typo in a name string raises at
import instead of silently mis-mapping a glyph (the concern that keeps
CCITT G4 honestly refused: arbitrary lookup tables with no oracle).
Two generated families ride the same rule:

* ASCII + Latin-1 + typographic names (``space``/``exclam``/…,
  ``endash``, ``fi``, ``germandbls``, …) — an explicit glyph→Unicode-
  name table resolved at import;
* accented Latin letters (``aacute``, ``Scedilla``, ``lslash``, …) —
  generated as ``LATIN {SMALL|CAPITAL} LETTER {X} WITH {ACCENT}`` for
  every letter × accent-suffix pair the UCD actually defines.

Plus the AGL application algorithm: ``uniXXXX`` (one or more 4-hex-digit
groups) and ``uXXXX[XX]`` map algorithmically (surrogates refused),
``.suffix`` variants strip to their base name, ``a_b`` ligature names
map each component, and ``.notdef`` is empty. Anything else raises
``KeyError`` — the PDF layer (``pdf_text._font_decoder``) turns that
into its named /Differences refusal rather than guessing.

Reference parity: none — document-pipeline support surface beside
``pdf_text.py`` (SURVEY §2-D).
"""

from __future__ import annotations

import re
import unicodedata

# glyph name -> OFFICIAL Unicode character name (resolved at import; a
# typo in either column is an import-time KeyError, not a wrong glyph)
_BY_UNICODE_NAME = {
    # --- ASCII 0x20-0x7E (the Standard/WinAnsi encoding names) ---
    "space": "SPACE",
    "exclam": "EXCLAMATION MARK",
    "quotedbl": "QUOTATION MARK",
    "numbersign": "NUMBER SIGN",
    "dollar": "DOLLAR SIGN",
    "percent": "PERCENT SIGN",
    "ampersand": "AMPERSAND",
    "quotesingle": "APOSTROPHE",
    "parenleft": "LEFT PARENTHESIS",
    "parenright": "RIGHT PARENTHESIS",
    "asterisk": "ASTERISK",
    "plus": "PLUS SIGN",
    "comma": "COMMA",
    "hyphen": "HYPHEN-MINUS",
    "period": "FULL STOP",
    "slash": "SOLIDUS",
    "zero": "DIGIT ZERO",
    "one": "DIGIT ONE",
    "two": "DIGIT TWO",
    "three": "DIGIT THREE",
    "four": "DIGIT FOUR",
    "five": "DIGIT FIVE",
    "six": "DIGIT SIX",
    "seven": "DIGIT SEVEN",
    "eight": "DIGIT EIGHT",
    "nine": "DIGIT NINE",
    "colon": "COLON",
    "semicolon": "SEMICOLON",
    "less": "LESS-THAN SIGN",
    "equal": "EQUALS SIGN",
    "greater": "GREATER-THAN SIGN",
    "question": "QUESTION MARK",
    "at": "COMMERCIAL AT",
    "bracketleft": "LEFT SQUARE BRACKET",
    "backslash": "REVERSE SOLIDUS",
    "bracketright": "RIGHT SQUARE BRACKET",
    "asciicircum": "CIRCUMFLEX ACCENT",
    "underscore": "LOW LINE",
    "grave": "GRAVE ACCENT",
    "braceleft": "LEFT CURLY BRACKET",
    "bar": "VERTICAL LINE",
    "braceright": "RIGHT CURLY BRACKET",
    "asciitilde": "TILDE",
    # --- Latin-1 supplement ---
    "exclamdown": "INVERTED EXCLAMATION MARK",
    "cent": "CENT SIGN",
    "sterling": "POUND SIGN",
    "currency": "CURRENCY SIGN",
    "yen": "YEN SIGN",
    "brokenbar": "BROKEN BAR",
    "section": "SECTION SIGN",
    "dieresis": "DIAERESIS",
    "copyright": "COPYRIGHT SIGN",
    "ordfeminine": "FEMININE ORDINAL INDICATOR",
    "guillemotleft": "LEFT-POINTING DOUBLE ANGLE QUOTATION MARK",
    "logicalnot": "NOT SIGN",
    "registered": "REGISTERED SIGN",
    "macron": "MACRON",
    "degree": "DEGREE SIGN",
    "plusminus": "PLUS-MINUS SIGN",
    "twosuperior": "SUPERSCRIPT TWO",
    "threesuperior": "SUPERSCRIPT THREE",
    "acute": "ACUTE ACCENT",
    "micro": "MICRO SIGN",
    "paragraph": "PILCROW SIGN",
    "periodcentered": "MIDDLE DOT",
    "cedilla": "CEDILLA",
    "onesuperior": "SUPERSCRIPT ONE",
    "ordmasculine": "MASCULINE ORDINAL INDICATOR",
    "guillemotright": "RIGHT-POINTING DOUBLE ANGLE QUOTATION MARK",
    "onequarter": "VULGAR FRACTION ONE QUARTER",
    "onehalf": "VULGAR FRACTION ONE HALF",
    "threequarters": "VULGAR FRACTION THREE QUARTERS",
    "questiondown": "INVERTED QUESTION MARK",
    "multiply": "MULTIPLICATION SIGN",
    "divide": "DIVISION SIGN",
    "germandbls": "LATIN SMALL LETTER SHARP S",
    "AE": "LATIN CAPITAL LETTER AE",
    "ae": "LATIN SMALL LETTER AE",
    "Eth": "LATIN CAPITAL LETTER ETH",
    "eth": "LATIN SMALL LETTER ETH",
    "Thorn": "LATIN CAPITAL LETTER THORN",
    "thorn": "LATIN SMALL LETTER THORN",
    # --- typographic / pdfTeX-common ---
    "quoteleft": "LEFT SINGLE QUOTATION MARK",
    "quoteright": "RIGHT SINGLE QUOTATION MARK",
    "quotedblleft": "LEFT DOUBLE QUOTATION MARK",
    "quotedblright": "RIGHT DOUBLE QUOTATION MARK",
    "quotesinglbase": "SINGLE LOW-9 QUOTATION MARK",
    "quotedblbase": "DOUBLE LOW-9 QUOTATION MARK",
    "guilsinglleft": "SINGLE LEFT-POINTING ANGLE QUOTATION MARK",
    "guilsinglright": "SINGLE RIGHT-POINTING ANGLE QUOTATION MARK",
    "endash": "EN DASH",
    "emdash": "EM DASH",
    "ellipsis": "HORIZONTAL ELLIPSIS",
    "bullet": "BULLET",
    "dagger": "DAGGER",
    "daggerdbl": "DOUBLE DAGGER",
    "perthousand": "PER MILLE SIGN",
    "fraction": "FRACTION SLASH",
    "florin": "LATIN SMALL LETTER F WITH HOOK",
    "ff": "LATIN SMALL LIGATURE FF",
    "fi": "LATIN SMALL LIGATURE FI",
    "fl": "LATIN SMALL LIGATURE FL",
    "ffi": "LATIN SMALL LIGATURE FFI",
    "ffl": "LATIN SMALL LIGATURE FFL",
    "trademark": "TRADE MARK SIGN",
    "minus": "MINUS SIGN",
    "Euro": "EURO SIGN",
    "OE": "LATIN CAPITAL LIGATURE OE",
    "oe": "LATIN SMALL LIGATURE OE",
    "dotlessi": "LATIN SMALL LETTER DOTLESS I",
    "circumflex": "MODIFIER LETTER CIRCUMFLEX ACCENT",
    "caron": "CARON",
    "breve": "BREVE",
    "dotaccent": "DOT ABOVE",
    "ring": "RING ABOVE",
    "ogonek": "OGONEK",
    "tilde": "SMALL TILDE",
    "hungarumlaut": "DOUBLE ACUTE ACCENT",
}

# accented-letter generation: AGL spells these as <letter><suffix>
# ("aacute", "Scedilla", "lslash") and Unicode names them "LATIN
# SMALL/CAPITAL LETTER <X> WITH <ACCENT>"; only pairs the UCD defines
# exist, so the generator cannot invent a wrong mapping
_ACCENT_SUFFIXES = {
    "acute": "ACUTE",
    "grave": "GRAVE",
    "circumflex": "CIRCUMFLEX",
    "tilde": "TILDE",
    "dieresis": "DIAERESIS",
    "ring": "RING ABOVE",
    "cedilla": "CEDILLA",
    "caron": "CARON",
    "breve": "BREVE",
    "macron": "MACRON",
    "ogonek": "OGONEK",
    "hungarumlaut": "DOUBLE ACUTE",
    "dotaccent": "DOT ABOVE",
    "slash": "STROKE",
}


def _build() -> dict:
    table = {}
    for ch in "abcdefghijklmnopqrstuvwxyz":
        table[ch] = ch
        table[ch.upper()] = ch.upper()
    for glyph, uname in _BY_UNICODE_NAME.items():
        table[glyph] = unicodedata.lookup(uname)
    for letter in "abcdefghijklmnopqrstuvwxyz":
        for suffix, accent in _ACCENT_SUFFIXES.items():
            for case, base in (("SMALL", letter), ("CAPITAL", letter.upper())):
                try:
                    ch = unicodedata.lookup(
                        f"LATIN {case} LETTER {letter.upper()} WITH {accent}"
                    )
                except KeyError:
                    continue
                table[base + suffix] = ch
    return table


GLYPH_MAP = _build()

# \Z, not $: $ also matches before a trailing newline, and a crafted
# name like "uni0041#0A" must refuse, not resolve
_UNI = re.compile(r"uni((?:[0-9A-F]{4})+)\Z")
_U = re.compile(r"u([0-9A-F]{4,6})\Z")


def _codepoint_char(cp: int, name: str) -> str:
    if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        raise KeyError(name)  # surrogates/out-of-range: not a character
    return chr(cp)


def glyph_to_text(name: str) -> str:
    """Unicode text for one glyph name per the AGL application
    algorithm: strip the first ``.suffix`` (``.notdef`` → empty),
    map each ``_``-separated component through the table or the
    ``uniXXXX``/``uXXXXXX`` rules. Raises ``KeyError`` for any
    component outside the core subset — callers turn that into their
    own loud, glyph-named refusal."""
    if name.startswith("."):
        if name == ".notdef":
            return ""
        raise KeyError(name)
    base = name.split(".", 1)[0]
    if not base:
        raise KeyError(name)
    out = []
    for comp in base.split("_"):
        got = GLYPH_MAP.get(comp)
        if got is not None:
            out.append(got)
            continue
        m = _UNI.match(comp)
        if m:
            hexes = m.group(1)
            out.extend(
                _codepoint_char(int(hexes[i : i + 4], 16), name)
                for i in range(0, len(hexes), 4)
            )
            continue
        m = _U.match(comp)
        if m:
            out.append(_codepoint_char(int(m.group(1), 16), name))
            continue
        raise KeyError(name)
    return "".join(out)
