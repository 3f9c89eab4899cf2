"""Markdown → training text, stdlib-only (the .md sibling of html_text).

GitHub-derived corpora are mostly Markdown; feeding raw markup into a
tokenizer wastes vocabulary on ``**`` and ``](``. This extractor keeps
what a language model should read and drops what is wiring, with the
same deterministic, library-free posture as ``operators/html_text.py``
(which owns HTML — this module never parses tags beyond dropping inline
HTML blocks):

* ATX headings keep their text (``#`` markers dropped); setext
  underlines drop;
* emphasis/strong/strikethrough markers drop, text kept;
* inline code keeps its content; FENCED code blocks keep their content
  verbatim (code is training data) but drop the fence lines and info
  string;
* links/images keep the anchor text, URLs drop (``[text](url)`` →
  ``text``; autolinks ``<http://…>`` drop entirely); reference-link
  definition lines drop;
* list bullets/numbers and blockquote markers strip, text kept with
  indentation-based nesting flattened;
* tables: pipes become single spaces, separator rows drop;
* horizontal rules, raw HTML block lines, and badge-only lines drop;
* whitespace normalizes per block — the ``html_text`` convention:
  single spaces inside a line, single blank line between blocks.

``markdown_to_text_frame`` is the Spark fan-out (map-only, one row per
document). Reference parity: none — builder-brief text surface
(SURVEY §2-D's corpus family).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_FENCE = re.compile(r"^\s{0,3}(`{3,}|~{3,})(.*)$")
_ATX = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_SETEXT = re.compile(r"^\s{0,3}(=+|-+)\s*$")
_HRULE = re.compile(r"^\s{0,3}((\*\s*){3,}|(-\s*){3,}|(_\s*){3,})$")
_BULLET = re.compile(r"^\s*([-+*]|\d{1,9}[.)])\s+")
_QUOTE = re.compile(r"^\s*(>\s?)+")
_REFDEF = re.compile(r"^\s{0,3}\[[^\]]+\]:\s+\S+")
_IMAGE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_LINK = re.compile(r"\[([^\]]*)\]\([^)]*\)")
_REFLINK = re.compile(r"\[([^\]]+)\]\[[^\]]*\]")
_AUTOLINK = re.compile(r"<(?:https?|ftp|mailto)[^>]*>")
_CODE_SPAN = re.compile(r"`([^`]*)`")
# '*'/'~~' may open intra-word; '_' may NOT (CommonMark: intra-word
# underscores are literal — snake_case identifiers in prose survive)
_EMPHASIS = re.compile(r"(\*{1,3}|~~)(?=\S)(.+?)(?<=\S)\1")
_EMPHASIS_U = re.compile(r"(?<!\w)(_{1,3})(?=\S)(.+?)(?<=\S)\1(?!\w)")
_HTML_BLOCK = re.compile(r"^\s{0,3}</?[A-Za-z][^>]*>\s*$")


def _inline(text: str) -> str:
    """Inline markup drops; CODE SPAN CONTENT IS PROTECTED — backticked
    text is lifted into placeholders before the emphasis/pipe passes and
    restored verbatim after, so `foo_bar` and `a | b` survive exactly."""
    spans: list = []

    def lift(m):
        spans.append(m.group(1))
        return f"\x00{len(spans) - 1}\x00"

    text = _CODE_SPAN.sub(lift, text)
    text = _IMAGE.sub(r"\1", text)
    text = _LINK.sub(r"\1", text)
    text = _REFLINK.sub(r"\1", text)
    text = _AUTOLINK.sub("", text)
    prev = None
    while prev != text:  # nested emphasis peels one layer per pass
        prev = text
        text = _EMPHASIS.sub(r"\2", text)
        text = _EMPHASIS_U.sub(r"\2", text)
    text = text.replace("|", " ")
    text = " ".join(text.split())
    return re.sub(r"\x00(\d+)\x00", lambda m: spans[int(m.group(1))], text)


def markdown_to_text(md: str) -> str:
    """One document in, extracted text out — deterministic, no library."""
    out_lines: list = []
    in_fence = None
    for line in md.replace("\r\n", "\n").split("\n"):
        fence = _FENCE.match(line)
        if fence:
            if in_fence is None:
                # any info string (incl. spaces: ```python title="x") opens
                in_fence = fence.group(1)[0]
                continue
            if fence.group(1)[0] == in_fence and not fence.group(2).strip():
                in_fence = None  # a bare same-type fence closes
                continue
            # a fence-ish line INSIDE a fence that doesn't close it is code
        if in_fence is not None:
            out_lines.append(line.rstrip())  # code verbatim, no inline pass
            continue
        if _SETEXT.match(line) and out_lines and out_lines[-1].strip():
            continue  # the underline of a setext heading
        if _HRULE.match(line) or _REFDEF.match(line) or _HTML_BLOCK.match(line):
            continue
        m = _ATX.match(line)
        if m:
            out_lines.append(_inline(m.group(2)))
            continue
        stripped = _QUOTE.sub("", line)
        stripped = _BULLET.sub("", stripped)
        stripped = _inline(stripped)  # whitespace/pipes handled inside
        # table separator rows reduce to dashes/colons/spaces -> drop
        if stripped.strip() and not re.fullmatch(r"[-: ]+", stripped):
            out_lines.append(stripped)
        elif not stripped.strip():
            out_lines.append("")
    # collapse runs of blank lines to single block breaks
    blocks: list = []
    for ln in out_lines:
        if ln == "" and (not blocks or blocks[-1] == ""):
            continue
        blocks.append(ln)
    while blocks and blocks[-1] == "":
        blocks.pop()
    return "\n".join(blocks)


def markdown_to_text_frame(
    df: DataFrame, md_col: str = "text", out_col: str = "extracted"
) -> DataFrame:
    """Map-only extraction over a markdown column via mapInPandas (the
    regex pipeline is pure Python; one row in, one row out; NULL markdown
    extracts as empty text — absence is not corruption for a text
    column)."""
    other = [c for c in df.columns if c != md_col]

    def extract(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [markdown_to_text(t or "") for t in pdf[md_col]]
            yield pdf[other + [out_col]]

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != md_col
    )
    return df.mapInPandas(extract, f"{schema}, {out_col} string")
