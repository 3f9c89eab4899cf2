"""Pin module-docstring refusal claims to the code's actual refusals.

The recurring drift class (round-12 D15, round-13 ``tiff.py`` BigTIFF):
a codec grows a real decoder but its module docstring still says the
format "refuses by name" — the first thing a reader trusts is then
wrong. A by-name refusal in this repo is a raise whose message NAMES the
format and says it is deliberately not decoded — ``NotImplementedError``
at dispatch grain (decode_image_real's fake-fallback contract), or a
``ValueError``/``KeyError`` whose message carries a refusal word
("not implemented" / "unsupported" / "refus…") at variant grain (jpeg's
``_REFUSED_SOF`` arithmetic frames). So the claim is mechanically
checkable: every docstring sentence that says something "refuses BY
NAME" must share a distinctive token with some REFUSAL-SHAPED raise
message (or a ``*REFUS*``-named module string table feeding one) in the
same module or a module it directly imports in-package (codecs
delegate — ``tiff`` raises fax refusals through ``ccittfax``,
``multimodal`` through ``jpeg``'s dispatch).

The class-vs-text distinction is what makes the check sharp: plain
ValueErrors about malformed/truncated input do NOT count as refusals, so
"BigTIFF refuses by name" over a module that DECODES BigTIFF (and only
names it in corrupt-header ValueErrors) fails — exactly the round-13
drift, pinned as a canary below. Sentences without "by name" are exempt;
the token match is deliberately loose (any distinctive word) because the
goal is to catch CLAIMS WITH NO REFUSER AT ALL, not to parse prose.
"""

from __future__ import annotations

import ast
import glob
import os
import re

PKG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hbase_observer_es_spark",
)

# words that appear in refusal prose but identify nothing
_STOPWORDS = {
    "refuse", "refuses", "refused", "refusal", "refusals", "refusing",
    "name", "still", "both", "with", "that", "this", "from", "only",
    "magic", "byte", "bytes", "offset", "offsets", "real", "since",
    "decode", "decodes", "decoded", "decoding", "their", "them", "then",
    "each", "every", "loud", "loudly", "honest", "surface", "members",
    "member", "family", "rather", "than", "silent", "silently", "skip",
    "skipped", "named", "names", "format", "formats", "file", "files",
    "layout", "walk", "walks", "today", "would", "should", "must",
}


def _static_text(node: ast.AST) -> str:
    """All string-literal fragments under a node (f-string static parts
    included), joined — the greppable surface of a raise message."""
    parts = []
    for sub in ast.walk(node):
        if isinstance(sub, ast.Constant) and isinstance(sub.value, str):
            parts.append(sub.value)
    return " ".join(parts)


_REFUSAL_WORD = re.compile(r"not implemented|unsupported|refus", re.I)


def _raiser_texts(tree: ast.Module) -> list[str]:
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Raise) and node.exc is not None:
            exc = node.exc
            if isinstance(exc, ast.Call) and isinstance(exc.func, ast.Name):
                text = _static_text(exc)
                if exc.func.id == "NotImplementedError" or _REFUSAL_WORD.search(
                    text
                ):
                    out.append(text)
        # module-level string tables feeding refusal messages by lookup
        # (jpeg._REFUSED_SOF): the names live in the table, not the raise
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and "REFUS" in tgt.id.upper():
                    out.append(_static_text(node.value))
    return out


def _local_imports(tree: ast.Module, from_file: str) -> list[str]:
    """Repo FILES this module imports in-package (relative imports
    resolved against the importing module's own directory)."""
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.level:
            base = os.path.dirname(from_file)
            for _ in range(node.level - 1):
                base = os.path.dirname(base)
            mod = node.module or ""
            names = [mod] + [
                (mod + "." if mod else "") + a.name for a in node.names
            ]
            for rel in names:
                cand = os.path.join(base, *rel.split(".")) + ".py"
                if os.path.exists(cand):
                    out.append(cand)
    return out


def _module_files() -> list[str]:
    pats = ("operators/*.py", "sources/*.py", "sinks/*.py", "streaming/*.py")
    files = []
    for p in pats:
        files += glob.glob(os.path.join(PKG_DIR, p))
    return sorted(f for f in files if not f.endswith("__init__.py"))


def _tokens(sentence: str) -> set[str]:
    toks = {t.lower() for t in re.findall(r"[A-Za-z0-9][A-Za-z0-9_]{3,}", sentence)}
    return toks - _STOPWORDS


def _overlaps(sent_tokens: set[str], hay: str, hay_tokens: set[str]) -> bool:
    """Loose token match with substring stemming in both directions:
    'filters' hits a raiser saying 'filter'; a '``\\x80theora``' token
    hits a raiser saying 'theora'."""
    for t in sent_tokens:
        if t in hay:
            return True
        if any(h in t for h in hay_tokens):
            return True
    return False


_CLAIM = re.compile(r"refus\w*\s+by\s+name|by[-\s]name\s+refus\w*", re.I)


def _claim_sentences(doc: str) -> list[str]:
    # sentence-ish splits; parenthetical clauses stay attached so the
    # claimed format name travels with its "refuses by name"
    flat = " ".join(doc.split())
    return [s for s in re.split(r"(?<=[.;]) ", flat) if _CLAIM.search(s)]


def test_every_by_name_refusal_claim_has_a_raiser():
    trees: dict[str, ast.Module] = {}
    for f in _module_files():
        with open(f) as fh:
            trees[f] = ast.parse(fh.read())

    failures = []
    for f, tree in list(trees.items()):
        doc = ast.get_docstring(tree) or ""
        claims = _claim_sentences(doc)
        if not claims:
            continue
        corpus = list(_raiser_texts(tree))
        deps = _local_imports(tree, f)
        # a claim may attribute its refusal to a named module
        # ("refused by name in ``doc_text.py``") — follow the pointer
        for mod in re.findall(r"([a-z_0-9]+)\.py", doc):
            for d in (os.path.dirname(f), PKG_DIR):
                cand = os.path.join(d, mod + ".py")
                if os.path.exists(cand):
                    deps.append(cand)
                    break
        for dep in deps:
            if dep not in trees:
                with open(dep) as fh:
                    trees[dep] = ast.parse(fh.read())
            corpus += _raiser_texts(trees[dep])
        hay = " ".join(corpus).lower()
        hay_tokens = _tokens(hay)
        for sentence in claims:
            if not _overlaps(_tokens(sentence), hay, hay_tokens):
                failures.append(
                    f"{os.path.relpath(f, PKG_DIR)}: docstring claims a "
                    f"by-name refusal with no matching refusal-shaped raise "
                    f"in the module or its direct imports: {sentence!r}"
                )
    assert not failures, "\n".join(failures)


def test_checker_catches_the_bigtiff_drift():
    """The checker itself must red on the exact round-13 drift: a
    docstring claiming 'BigTIFF (magic 43) refuses by name' over a
    module that DECODES BigTIFF — where the only raises naming it are
    plain corrupt-input ValueErrors (truncated/invalid header), which
    must NOT count as refusers."""
    stale = (
        '"""BigTIFF (magic 43) refuses by name."""\n'
        "def f(data, origin):\n"
        "    if len(data) < 16:\n"
        "        raise ValueError(\n"
        "            f'tiff {origin}: too short for a BigTIFF header')\n"
        "    if data[4] != 8:\n"
        "        raise ValueError(\n"
        "            f'tiff {origin}: BigTIFF offset size invalid')\n"
    )
    tree = ast.parse(stale)
    doc = ast.get_docstring(tree) or ""
    claims = _claim_sentences(doc)
    assert claims, "claim sentence not detected"
    hay = " ".join(_raiser_texts(tree)).lower()
    assert not (_tokens(claims[0]) & _tokens(hay)), (
        "stale claim should have no refusal-shaped raiser overlap"
    )
