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
  ``object``/headers/footers/``field`` instructions), and the ``\\*``
  convention skips any unrecognized destination group — exactly the
  fallback readers the spec mandates (and the leak vector: a
  ``\\*\\generator`` payload must never reach the text);
* code-page bytes (plain text and ``\\'xx``) accumulate into RUNS and
  decode STRICTLY through the document's ``\\ansicpgN`` codec (cp1252
  default) — double-byte pages (cp932/936/949/950) decode correctly,
  and a byte sequence the page cannot represent refuses by name rather
  than folding replacement garbage into the corpus;
* ``\\uN`` emits the Unicode code point (signed 16-bit per spec, UTF-16
  surrogate pairs combined, lone surrogates loud) and swallows the
  current ``\\uc`` count of fallback units — a fallback unit is a plain
  character, one ``\\'xx`` escape, one control symbol, one
  non-state-bearing control word, or one ``\\binN`` with its data;
* ``\\binN`` skips N raw binary bytes (overrun is loud);
* ``\\par``/``\\line``/``\\sect``/``\\page`` break lines, ``\\tab``
  tabs, ``\\~`` is a non-breaking space, ``\\-``/``\\_`` (optional/
  non-breaking hyphens) normalize.

Guards per the document-family rule: group depth is capped (stack bombs
are attacker data), an unbalanced or truncated file names its byte
offset, an unknown code page or malformed control-word parameter
refuses by name. ``rtf_text_frame`` is the Spark fan-out — one payload
per task row via mapInPandas, the office_text.py shape.

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

_HEX = frozenset(b"0123456789abcdefABCDEF")

# state-bearing control words that must execute even inside a \uN
# fallback run (swallowing them would desynchronize the group state)
_STATEFUL = frozenset({"u", "uc", "bin", "ansicpg"})


def looks_like_rtf(payload: bytes) -> bool:
    return payload[: len(RTF_MAGIC)] == RTF_MAGIC


def rtf_to_text(data: bytes, origin: str = "<bytes>") -> str:
    """One RTF payload → its document text (destination groups skipped,
    paragraph structure as newlines). See the module docstring for the
    decode/skip semantics."""
    if not looks_like_rtf(data):
        raise ValueError(
            f"rtf {origin}: not an RTF stream (bytes 0-4 {data[:5]!r})"
        )
    out: list = []
    byte_buf = bytearray()  # pending code-page bytes, decoded as a run
    # group state: (uc_count, skipping)
    uc = 1
    skipping = False
    stack: list = []
    codepage = "cp1252"
    pending_uc_skip = 0  # fallback units to swallow after \uN
    pending_high: int | None = None  # stashed UTF-16 high surrogate

    def flush(at: int) -> None:
        if not byte_buf:
            return
        if pending_high is not None:
            raise ValueError(
                f"rtf {origin}: lone high surrogate before byte {at} "
                "(corrupt \\u pair)"
            )
        try:
            out.append(byte_buf.decode(codepage))
        except UnicodeDecodeError as exc:
            raise ValueError(
                f"rtf {origin}: text near byte {at} does not decode as "
                f"{codepage} ({exc}) — refusing rather than mis-decoding"
            ) from None
        byte_buf.clear()

    def emit_cp(cp: int, at: int) -> None:
        nonlocal pending_high
        if 0xD800 <= cp <= 0xDBFF:
            if pending_high is not None:
                raise ValueError(
                    f"rtf {origin}: two high surrogates in a row at "
                    f"byte {at}"
                )
            pending_high = cp
            return
        if 0xDC00 <= cp <= 0xDFFF:
            if pending_high is None:
                raise ValueError(
                    f"rtf {origin}: lone low surrogate at byte {at}"
                )
            out.append(chr(
                0x10000 + ((pending_high - 0xD800) << 10) + (cp - 0xDC00)
            ))
            pending_high = None
            return
        if pending_high is not None:
            raise ValueError(
                f"rtf {origin}: high surrogate not followed by its low "
                f"half at byte {at}"
            )
        out.append(chr(cp))

    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x7B:  # {
            flush(i)
            pending_uc_skip = 0  # fallback data never spans a brace
            if len(stack) >= _MAX_DEPTH:
                raise ValueError(
                    f"rtf {origin}: group depth past {_MAX_DEPTH} at "
                    f"byte {i} — refusing (stack bomb)"
                )
            stack.append((uc, skipping))
            i += 1
            continue
        if c == 0x7D:  # }
            flush(i)
            if not stack:
                raise ValueError(
                    f"rtf {origin}: unbalanced '}}' at byte {i}"
                )
            uc, skipping = stack.pop()
            pending_uc_skip = 0  # fallback data never spans a brace
            i += 1
            continue
        if c != 0x5C:  # plain text byte
            if c in (0x0D, 0x0A, 0x00):
                pass  # line-wrap bytes are ignored ENTIRELY per spec:
                # they are not text and not \uN fallback units either
            elif pending_uc_skip > 0:
                pending_uc_skip -= 1
            elif not skipping:
                if pending_high is not None:
                    raise ValueError(
                        f"rtf {origin}: lone high surrogate before "
                        f"byte {i} (corrupt \\u pair)"
                    )
                byte_buf.append(c)
            i += 1
            continue
        # control word or symbol
        if i + 1 >= n:
            raise ValueError(f"rtf {origin}: truncated control at byte {i}")
        ch = data[i + 1]
        if ch == 0x27:  # \'xx hex escape: exactly two hex digits
            hx = data[i + 2 : i + 4]
            if len(hx) != 2:
                raise ValueError(
                    f"rtf {origin}: truncated \\' escape at byte {i}"
                )
            if hx[0] not in _HEX or hx[1] not in _HEX:
                raise ValueError(
                    f"rtf {origin}: bad \\' hex {hx!r} at byte {i}"
                )
            if pending_uc_skip > 0:
                pending_uc_skip -= 1
            elif not skipping:
                byte_buf.append(int(hx, 16))
            i += 4
            continue
        if not (0x61 <= ch <= 0x7A or 0x41 <= ch <= 0x5A):
            # control symbol: one character
            sym = chr(ch)
            if sym == "*":
                # the \* convention: the group is a destination a
                # reader may skip — and an extractor MUST, or private
                # payloads (\*\generator Riched20 ...) leak into text
                skipping = True
            elif pending_uc_skip > 0:
                pending_uc_skip -= 1  # one skippable fallback unit
            elif not skipping:
                flush(i)
                if pending_high is not None:
                    raise ValueError(
                        f"rtf {origin}: lone high surrogate before "
                        f"byte {i} (corrupt \\u pair)"
                    )
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
            param = data[j:k]
            if param == b"-":
                raise ValueError(
                    f"rtf {origin}: control word \\{word} has a bare "
                    f"minus with no digits at byte {j}"
                )
            if len(param.lstrip(b"-")) > 10:
                raise ValueError(
                    f"rtf {origin}: control word \\{word} parameter "
                    f"longer than 10 digits at byte {j}"
                )
            num = int(param)
        if k < n and data[k] == 0x20:
            k += 1  # the delimiter space belongs to the control word
        i = k
        if pending_uc_skip > 0 and word not in _STATEFUL \
                and word not in _SKIP_DESTINATIONS:
            # a control word is one skippable fallback unit (state and
            # destination words still execute — swallowing them would
            # desynchronize uc/codepage/group state)
            pending_uc_skip -= 1
            continue
        if word == "bin":
            count = max(0, num or 0)
            if i + count > n:
                raise ValueError(
                    f"rtf {origin}: \\bin{count} at byte {j} overruns "
                    "the file"
                )
            i += count  # raw bytes, never text
            if pending_uc_skip > 0:
                pending_uc_skip -= 1  # \bin + its data = one unit
            continue
        if word == "u":
            if num is None:
                raise ValueError(
                    f"rtf {origin}: \\u without a code point at byte {j}"
                )
            if not -32768 <= num <= 65535:
                raise ValueError(
                    f"rtf {origin}: \\u{num} outside the signed-16-bit "
                    f"range at byte {j}"
                )
            if not skipping:
                flush(i)
                emit_cp(num + 65536 if num < 0 else num, j)
            pending_uc_skip = uc
            continue
        if word == "uc":
            uc = max(0, num or 0)
            continue
        if word == "ansicpg":
            flush(i)  # pending bytes belong to the previous page
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
            flush(i)
            if pending_high is not None:
                raise ValueError(
                    f"rtf {origin}: lone high surrogate before byte {i}"
                )
            out.append(_BREAKS[word])
        # all other control words are formatting — dropped
    flush(n)
    if pending_high is not None:
        raise ValueError(
            f"rtf {origin}: lone high surrogate at end of file"
        )
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
