"""RTF text extraction from the public Rich Text Format specification,
stdlib-only.

RTF is the pre-OOXML word-processing interchange format and still ships
in email attachments and legacy document dumps — a crawled corpus hits
``.rtf`` long before it hits ODT. Extraction follows the published RTF
1.x syntax:

* the token grammar: groups (``{`` ``}``), control words
  (``\\word[-]N?`` with the optional space delimiter), control symbols
  (``\\'xx`` hex escapes, ``\\~`` ``\\-`` ``\\_`` ``\\\\`` ``\\{``
  ``\\}``), and plain text;
* group state is a real stack: the per-group ``\\ucN`` skip count and
  destination-skip flag save on ``{`` and restore on ``}``;
* destinations that are NOT document text are skipped by name
  (``fonttbl``/``colortbl``/``stylesheet``/``info``/``pict``/
  ``object``/headers/footers/``field`` instructions), and the
  ``\\*\\unknown`` convention skips any unrecognized destination —
  exactly the fallback readers the spec mandates;
* ``\\uN`` emits the Unicode code point (signed 16-bit per spec) and
  swallows the current ``\\uc`` count of fallback bytes; ``\\'xx``
  decodes through the document's ``\\ansicpgN`` code page (cp1252
  default); ``\\binN`` skips N raw binary bytes;
* ``\\par``/``\\line``/``\\sect``/``\\page`` break lines, ``\\tab``
  tabs, ``\\~`` is a non-breaking space, ``\\-``/``\\_`` (optional/
  non-breaking hyphens) normalize.

Guards per the document-family rule: group depth is capped (stack bombs
are attacker data), an unbalanced or truncated file names its byte
offset, an unknown code page refuses by name. ``rtf_text_frame`` is the
Spark fan-out — one payload per task row via mapInPandas, the
office_text.py shape.

Reference parity: none — builder-brief document surface, SURVEY §2-D.
"""

from __future__ import annotations

RTF_MAGIC = b"{\\rtf"

_MAX_DEPTH = 128

# destination control words whose group content is never document text
_SKIP_DESTINATIONS = frozenset({
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf", "footerl",
    "footerr", "footerf", "comment", "annotation", "xe", "tc", "txe",
    "fldinst", "themedata", "colorschememapping", "datastore",
    "latentstyles", "listtable", "listoverridetable", "revtbl",
    "rsidtbl", "generator", "bkmkstart", "bkmkend",
})

_BREAKS = {"par": "\n", "line": "\n", "sect": "\n", "page": "\n",
           "tab": "\t", "emdash": "—", "endash": "–",
           "lquote": "‘", "rquote": "’",
           "ldblquote": "“", "rdblquote": "”",
           "bullet": "•", "emspace": " ", "enspace": " ",
           "qmspace": " "}


def looks_like_rtf(payload: bytes) -> bool:
    return payload[: len(RTF_MAGIC)] == RTF_MAGIC


def rtf_to_text(data: bytes, origin: str = "<bytes>") -> str:
    """One RTF payload → its document text (destination groups skipped,
    paragraph structure as newlines)."""
    if not looks_like_rtf(data):
        raise ValueError(
            f"rtf {origin}: not an RTF stream (bytes 0-4 {data[:5]!r})"
        )
    out: list = []
    # group state: (uc_count, skipping)
    uc = 1
    skipping = False
    stack: list = []
    codepage = "cp1252"
    pending_uc_skip = 0  # fallback bytes to swallow after \uN
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x7B:  # {
            if len(stack) >= _MAX_DEPTH:
                raise ValueError(
                    f"rtf {origin}: group depth past {_MAX_DEPTH} at "
                    f"byte {i} — refusing (stack bomb)"
                )
            stack.append((uc, skipping))
            i += 1
            continue
        if c == 0x7D:  # }
            if not stack:
                raise ValueError(
                    f"rtf {origin}: unbalanced '}}' at byte {i}"
                )
            uc, skipping = stack.pop()
            i += 1
            continue
        if c != 0x5C:  # plain text byte
            if pending_uc_skip > 0:
                pending_uc_skip -= 1
            elif not skipping and c not in (0x0D, 0x0A, 0x00):
                out.append(bytes([c]).decode(codepage, errors="replace"))
            i += 1
            continue
        # control word or symbol
        if i + 1 >= n:
            raise ValueError(f"rtf {origin}: truncated control at byte {i}")
        ch = data[i + 1]
        if ch == 0x27:  # \'xx hex escape
            hx = data[i + 2 : i + 4]
            if len(hx) != 2:
                raise ValueError(
                    f"rtf {origin}: truncated \\' escape at byte {i}"
                )
            try:
                b = int(hx, 16)
            except ValueError:
                raise ValueError(
                    f"rtf {origin}: bad \\' hex {hx!r} at byte {i}"
                ) from None
            if pending_uc_skip > 0:
                pending_uc_skip -= 1
            elif not skipping:
                out.append(bytes([b]).decode(codepage, errors="replace"))
            i += 4
            continue
        if not (0x61 <= ch <= 0x7A or 0x41 <= ch <= 0x5A):
            # control symbol: one character
            sym = chr(ch)
            if sym == "*":
                # the \* convention: the group is a destination a
                # reader may skip -- and an extractor MUST, or private
                # payloads (\*\generator Riched20 ...) leak into text
                skipping = True
            elif not skipping and pending_uc_skip == 0:
                if sym == "~":
                    out.append(" ")
                elif sym in "\\{}":
                    out.append(sym)
                elif sym == "_":
                    out.append("-")
                # \- (optional hyphen) and others drop
            i += 2
            continue
        # control word: letters then optional signed number then a
        # single swallowed space delimiter
        j = i + 1
        while j < n and (0x61 <= data[j] <= 0x7A or 0x41 <= data[j] <= 0x5A):
            j += 1
        word = data[i + 1 : j].decode("ascii")
        num = None
        k = j
        if k < n and (data[k] == 0x2D or 0x30 <= data[k] <= 0x39):
            k += 1
            while k < n and 0x30 <= data[k] <= 0x39:
                k += 1
            num = int(data[j:k])
        if k < n and data[k] == 0x20:
            k += 1  # the delimiter space belongs to the control word
        i = k
        if word == "bin":
            i += max(0, num or 0)  # raw bytes, never text
            continue
        if word == "u":
            if num is None:
                raise ValueError(
                    f"rtf {origin}: \\u without a code point at byte {j}"
                )
            if not skipping:
                cp = num + 65536 if num < 0 else num  # signed 16-bit
                out.append(chr(cp))
            pending_uc_skip = uc
            continue
        if word == "uc":
            uc = max(0, num or 0)
            continue
        if word == "ansicpg":
            codec = f"cp{num}"
            try:
                b"\x41".decode(codec)
            except LookupError:
                raise ValueError(
                    f"rtf {origin}: unknown code page {num} — refusing "
                    "rather than mis-decoding"
                ) from None
            codepage = codec
            continue
        if word in _SKIP_DESTINATIONS:
            skipping = True
            continue
        if word == "" and num is None:
            continue
        if not skipping and word in _BREAKS:
            out.append(_BREAKS[word])
        # all other control words are formatting — dropped
    if stack:
        raise ValueError(
            f"rtf {origin}: {len(stack)} unclosed group(s) at end of file"
        )
    return "".join(out)


RTF_TEXT_SCHEMA = "n_chars long, text string"


def rtf_text_frame(df, payload_col: str = "payload", id_col: str = "doc_id"):
    """mapInPandas extraction over a binary RTF column — one payload per
    row, Arrow-batched, the office_text.py fan-out shape."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            rows = {k: [] for k in (id_col, "n_chars", "text")}
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                text = rtf_to_text(bytes(payload), origin=str(key))
                rows[id_col].append(key)
                rows["n_chars"].append(len(text))
                rows["text"].append(text)
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, f"{id_col} long, {RTF_TEXT_SCHEMA}")
