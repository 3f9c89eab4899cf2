"""ES `query_string` mini-language, compiled to Spark predicates.

The reference delegates full-text querying to Elasticsearch (README.md:3 in
/root/reference), and the query_string syntax is how ES users actually type
ad-hoc boolean text queries. This module implements the core grammar —

    expr    := or
    or      := and (("OR" | "||") and)*
    and     := unary (("AND" | "&&") unary)*     # adjacency = default OR
    unary   := ("NOT" | "-") unary | primary
    primary := "(" expr ")" | '"phrase words"' | fielded | prefix* | term
    fielded := "text:" (prefix* | term)          # analyzed field, explicit
             | ("lang:" | "source:") term        # keyword fields, exact match

— as a recursive-descent parser producing one AST that compiles to BOTH
engines: a pyspark Column predicate over the token array, and the equivalent
DuckDB SQL boolean over the same tokenization. One AST, two renderings —
the engines agree by construction, not by parallel maintenance.

Semantics per clause (whole-token, the analyzer's view):
* term     — token membership (ES term-in-analyzed-field);
* prefix*  — any token with the prefix (ES prefix expansion, run positionally
             — no dictionary needed inside a boolean filter);
* "a b"    — positional adjacency via integer index arithmetic (the
             q_search_phrase machinery, generalized to n words);
* NOT / -  — must_not; AND/OR/parens as written; bare adjacency is OR
             (ES default_operator=OR);
* field:v  — D16 partial-close (round 8): `text:` resolves to the analyzed
             field (same term/prefix rules as a bare clause); `lang:` and
             `source:` are KEYWORD fields — exact string equality on the
             column, the ES keyword-mapping semantics. Any other field name,
             an empty value, a wildcarded keyword value, or a fielded phrase
             raises ValueError — the parser stays fail-closed.

Scale: the compiled predicate is a single map-only filter over one scan —
boolean text search never shuffles, joins, or materializes expansions. The
parse happens ONCE on the driver (query-sized input); only the compiled
columnar expression ships to executors.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table


# --------------------------------------------------------------------------- AST


@dataclass(frozen=True)
class Term:
    word: str


@dataclass(frozen=True)
class Prefix:
    prefix: str


@dataclass(frozen=True)
class Phrase:
    words: tuple[str, ...]


@dataclass(frozen=True)
class FieldTerm:
    """Exact match on a KEYWORD field (ES keyword mapping: no analysis)."""

    field: str
    value: str


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class And:
    children: tuple[object, ...]


@dataclass(frozen=True)
class Or:
    children: tuple[object, ...]


# ------------------------------------------------------------------------ parser

# the fixture schema's one analyzed field and its two keyword fields — the
# resolvable field-prefix universe (D16); everything else fails closed
ANALYZED_FIELD = "text"
KEYWORD_FIELDS = ("lang", "source")

_TOKEN_RE = re.compile(
    r'\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<quote>"[^"]*")|'
    r"(?P<op>AND\b|OR\b|NOT\b|&&|\|\|)|(?P<neg>-)|(?P<word>[^\s()\"-]+))"
)


def _lex(q: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip():
                raise ValueError(f"query_string: cannot lex at {q[pos:]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"query_string: trailing input at {self.peek()!r}")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while True:
            nxt = self.peek()
            if nxt and nxt[1] in ("OR", "||"):
                self.take()
                parts.append(self.and_expr())
            elif nxt and nxt[0] in ("lparen", "quote", "neg", "word"):
                # bare adjacency: ES default_operator=OR — an implicit OR
                parts.append(self.and_expr())
            else:
                break
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def and_expr(self):
        parts = [self.unary()]
        while self.peek() and self.peek()[1] in ("AND", "&&"):
            self.take()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def unary(self):
        nxt = self.peek()
        if nxt and (nxt[1] == "NOT" or nxt[0] == "neg"):
            self.take()
            return Not(self.unary())
        return self.primary()

    def primary(self):
        kind, val = self.take()
        if kind == "lparen":
            node = self.or_expr()
            if not self.peek() or self.take()[0] != "rparen":
                raise ValueError("query_string: unbalanced parenthesis")
            return node
        if kind == "quote":
            words = tuple(w for w in val[1:-1].split(" ") if w)
            if not words:
                raise ValueError("query_string: empty phrase")
            return Phrase(words) if len(words) > 1 else Term(words[0])
        if kind == "word":
            if ":" in val:
                field, _, rest = val.partition(":")
                if not rest:
                    raise ValueError(
                        f"query_string: empty value for field {field!r}"
                    )
                if field == ANALYZED_FIELD:
                    return self._analyzed_clause(rest)
                if field in KEYWORD_FIELDS:
                    if any(ch in rest for ch in ":*?"):
                        raise ValueError(
                            f"query_string: keyword field {field!r} takes an "
                            f"exact value, got {rest!r}"
                        )
                    return FieldTerm(field, rest)
                raise ValueError(
                    f"query_string: unsupported field {field!r}; supported: "
                    f"{ANALYZED_FIELD}, {', '.join(KEYWORD_FIELDS)}"
                )
            return self._analyzed_clause(val)
        raise ValueError(f"query_string: unexpected token {val!r}")

    @staticmethod
    def _analyzed_clause(val: str):
        if val.endswith("*") and len(val) > 1 and "*" not in val[:-1]:
            return Prefix(val[:-1])
        if "*" in val or "?" in val:
            raise ValueError(
                "query_string: only trailing-* wildcards are supported here; "
                "use q_search_wildcard for general patterns"
            )
        return Term(val)


def parse(q: str):
    """Parse an ES query_string expression into the module AST. Adjacent
    clauses combine with OR (ES default_operator); NOT and '-' are must_not."""
    toks = _lex(q)
    if not toks:
        raise ValueError("query_string: empty query")
    return _Parser(toks).parse()


# ---------------------------------------------------------------- two renderings


def compile_spark(node, tk: Column) -> Column:
    """Render the AST as a pyspark boolean Column over token array ``tk``."""
    if isinstance(node, Term):
        return F.array_contains(tk, node.word)
    if isinstance(node, Prefix):
        return F.exists(tk, lambda t: t.startswith(node.prefix))
    if isinstance(node, Phrase):
        n = len(node.words)
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1)))

        def match_at(i):
            c = F.try_element_at(tk, i) == node.words[0]
            for j, w in enumerate(node.words[1:], start=1):
                c = c & (F.try_element_at(tk, i + j) == w)
            return c
        return F.exists(idx, match_at)
    if isinstance(node, FieldTerm):
        # keyword field: exact column equality — resolved against the row,
        # not the token array (the ES keyword-vs-analyzed mapping split)
        return F.col(node.field) == F.lit(node.value)
    if isinstance(node, Not):
        return ~compile_spark(node.child, tk)
    if isinstance(node, And):
        out = compile_spark(node.children[0], tk)
        for ch in node.children[1:]:
            out = out & compile_spark(ch, tk)
        return out
    if isinstance(node, Or):
        out = compile_spark(node.children[0], tk)
        for ch in node.children[1:]:
            out = out | compile_spark(ch, tk)
        return out
    raise TypeError(f"unknown node {node!r}")


def _sq(w: str) -> str:
    return w.replace("'", "''")


def compile_sql(node, tk: str = "tk") -> str:
    """Render the AST as a DuckDB boolean over token list column ``tk`` —
    the oracle twin of compile_spark, generated from the SAME tree."""
    if isinstance(node, Term):
        return f"list_contains({tk}, '{_sq(node.word)}')"
    if isinstance(node, Prefix):
        return f"len(list_filter({tk}, x -> x LIKE '{_sq(node.prefix)}%')) > 0"
    if isinstance(node, Phrase):
        n = len(node.words)
        conds = " AND ".join(
            f"{tk}[i + {j}] = '{_sq(w)}'" if j else f"{tk}[i] = '{_sq(w)}'"
            for j, w in enumerate(node.words)
        )
        return (
            f"len(list_filter(generate_series(1, greatest(len({tk}) - {n - 1}, 1)), "
            f"i -> {conds})) > 0"
        )
    if isinstance(node, FieldTerm):
        return f"{node.field} = '{_sq(node.value)}'"
    if isinstance(node, Not):
        return f"(NOT {compile_sql(node.child, tk)})"
    if isinstance(node, And):
        return "(" + " AND ".join(compile_sql(c, tk) for c in node.children) + ")"
    if isinstance(node, Or):
        return "(" + " OR ".join(compile_sql(c, tk) for c in node.children) + ")"
    raise TypeError(f"unknown node {node!r}")


# ------------------------------------------------------------------- registry op

# exercises every grammar production: phrase, parens, AND/OR, NOT, explicit
# analyzed-field prefix (text:fa*), keyword-field exact match (lang:)
QS_QUERY = '("the table" OR (scan AND sort)) AND NOT slow AND text:fa* AND NOT lang:zh'
_QS_AST = parse(QS_QUERY)


def _toks() -> Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def keyword_fields_used(node) -> set[str]:
    """Keyword columns the compiled predicate will reference — the operator
    projects exactly these (plus the token array), keeping column pruning
    tight for queries that use no field prefixes."""
    if isinstance(node, FieldTerm):
        return {node.field}
    if isinstance(node, Not):
        return keyword_fields_used(node.child)
    if isinstance(node, (And, Or)):
        out: set[str] = set()
        for c in node.children:
            out |= keyword_fields_used(c)
        return out
    return set()


def q_search_querystring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `query_string` over the analyzed text field: QS_QUERY parsed once on
    the driver, compiled to a map-only token-array predicate (module
    docstring has the grammar). Returns the matching documents — ES
    constant_score boolean filtering, the dominant production use of
    query_string in filters and dashboards.
    """
    d = table(spark, sf_dir, "documents")
    # explode(array(tk)) is a Generate BARRIER: a plain select+filter gets
    # projection-collapsed, re-expanding the split() at EVERY tk reference in
    # the compiled predicate (2 per phrase position — profiled 6× slower, the
    # q_search_phrase docstring's re-split trap). Predicates cannot push below
    # a Generate, so the token array materializes exactly once per row.
    carry = sorted({"lang"} | keyword_fields_used(_QS_AST))
    dd = d.select("doc_id", *carry, F.explode(F.array(_toks())).alias("tk"))
    return dd.filter(compile_spark(_QS_AST, F.col("tk"))).select("doc_id", "lang")


SQL_SEARCH_QUERYSTRING = f"""
SELECT doc_id, lang
FROM (
    SELECT doc_id, lang, source,
           list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
)
WHERE {compile_sql(_QS_AST)}
"""


QUERIES = {"q_search_querystring": q_search_querystring}
ORACLES = {"q_search_querystring": SQL_SEARCH_QUERYSTRING}
