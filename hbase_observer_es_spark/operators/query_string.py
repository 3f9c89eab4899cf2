"""ES `query_string` mini-language, compiled to Spark predicates.

The reference delegates full-text querying to Elasticsearch (README.md:3 in
/root/reference), and the query_string syntax is how ES users actually type
ad-hoc boolean text queries. This module implements the core grammar —

    expr    := or
    or      := and (("OR" | "||") and)*
    and     := unary (("AND" | "&&") unary)*     # adjacency = default OR
    unary   := ("NOT" | "-") unary | primary
    primary := "(" expr ")" | '"phrase words"' | fielded | prefix* | term
    fielded := "text:" (prefix* | term | '"phrase"')   # analyzed field
             | ("lang:" | "source:") (term | '"exact"')  # keyword, exact
             | ("n_chars:" | "doc_id:") number          # numeric, exact
             | field ":" range                          # range / comparison
    range   := ("[" | "{") (value | "*") "TO" (value | "*") ("]" | "}")
             | (">" | ">=" | "<" | "<=") value

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
             an empty value, or a wildcarded keyword value raises
             ValueError — the parser stays fail-closed.
* ranges   — D16 second close (round 9): `field:[a TO b]` / `{a TO b}` (and
             mixed brackets; `*` = unbounded end) and `field:>n` `>=n` `<n`
             `<=n` comparisons, over keyword fields (lexicographic, the ES
             keyword-range rule — fixture values are ASCII so Spark's binary
             and DuckDB's default collation agree) and numeric fields
             (`n_chars`, `doc_id` — values must parse as integers, else
             ValueError). `field:[* TO *]` is the ES exists query → IS NOT
             NULL. Pure comparisons, no libm — fully hash-verifiable.
* text:"p" — fielded phrases (round 9): `text:"w1 w2"` is the positional
             phrase production on the analyzed field; `lang:"v"` on a keyword
             field is exact equality with the quoted string verbatim.
* NULLs    — every LEAF predicate is two-valued (`coalesce(P, FALSE)` in both
             renderings): a row whose field is NULL never matches a positive
             clause and ALWAYS matches its negation — the ES semantics, where
             a must_not term query matches documents missing the field.
             (Round 9; previously NOT over a NULL keyword dropped the row by
             three-valued logic in both engines — agreeing hashes, disclosed
             fidelity gap, now closed.)
* fail-closed stays for: boosts (`^2`), fuzziness (`~`) — both now rejected
             EXPLICITLY (they would reopen the D10 libm scoring problem) —
             non-trailing wildcards, `?`, and unknown fields.

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
    """Exact match on a KEYWORD field (ES keyword mapping: no analysis) or a
    numeric field (value is then an int)."""

    field: str
    value: object  # str for keyword fields, int for numeric fields


@dataclass(frozen=True)
class FieldRange:
    """ES range query on a keyword (lexicographic) or numeric field.
    ``lo``/``hi`` are None for an unbounded end; both-None is the ES exists
    query (field IS NOT NULL)."""

    field: str
    lo: object | None
    hi: object | None
    lo_incl: bool
    hi_incl: bool


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

# the fixture schema's one analyzed field, two keyword fields, and two
# numeric fields — the resolvable field-prefix universe (D16); everything
# else fails closed
ANALYZED_FIELD = "text"
KEYWORD_FIELDS = ("lang", "source")
NUMERIC_FIELDS = ("n_chars", "doc_id")

# fquote (field:"...") and frange (field:[.. TO ..]) must precede quote/word
# in the alternation: at a letter position `word` would otherwise eat up to
# the quote/bracket and mis-split the clause.
_TOKEN_RE = re.compile(
    r"\s*(?:(?P<lparen>\()|(?P<rparen>\))|"
    r'(?P<fquote>[A-Za-z_][A-Za-z0-9_]*:"[^"]*")|'
    r"(?P<frange>[A-Za-z_][A-Za-z0-9_]*:[\[{][^\]}]*[\]}])|"
    # fielded value beginning with '-' (negative literal or a comparison to
    # one): must precede `neg`/`word`, whose split would otherwise truncate
    # the token at the dash and mis-report the value as empty
    r"(?P<fword>[A-Za-z_][A-Za-z0-9_]*:(?:>=|<=|>|<)?-[^\s()\"\-]*)|"
    r'(?P<quote>"[^"]*")|'
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
            return self._phrase_clause(val[1:-1])
        if kind == "fquote":
            field, _, quoted = val.partition(":")
            inner = quoted[1:-1]
            if field == ANALYZED_FIELD:
                return self._phrase_clause(inner)
            if field in KEYWORD_FIELDS:
                # keyword exact match with the quoted string VERBATIM (may
                # contain spaces) — the ES term-query-on-keyword semantics
                if not inner:
                    raise ValueError(
                        f"query_string: empty value for field {field!r}"
                    )
                return FieldTerm(field, inner)
            raise ValueError(
                f"query_string: field {field!r} does not take a quoted value; "
                f"supported: {ANALYZED_FIELD}, {', '.join(KEYWORD_FIELDS)}"
            )
        if kind == "frange":
            field, _, rng = val.partition(":")
            return self._range_clause(field, rng)
        if kind in ("word", "fword"):
            if ":" in val:
                field, _, rest = val.partition(":")
                if not rest:
                    raise ValueError(
                        f"query_string: empty value for field {field!r}"
                    )
                if rest[0] in "<>":
                    return self._cmp_clause(field, rest)
                if rest[0] == "-" and field not in NUMERIC_FIELDS:
                    # a leading '-' is a negative LITERAL only for numeric
                    # fields; on text/keyword it reads as embedded negation,
                    # which this grammar does not define — fail closed
                    raise ValueError(
                        f"query_string: value for field {field!r} cannot start "
                        f"with '-' (write NOT {field}:value for negation)"
                    )
                if field == ANALYZED_FIELD:
                    return self._analyzed_clause(rest)
                if field in KEYWORD_FIELDS:
                    if any(ch in rest for ch in ":*?~^"):
                        raise ValueError(
                            f"query_string: keyword field {field!r} takes an "
                            f"exact value, got {rest!r}"
                        )
                    return FieldTerm(field, rest)
                if field in NUMERIC_FIELDS:
                    return FieldTerm(field, self._num(field, rest))
                raise ValueError(
                    f"query_string: unsupported field {field!r}; supported: "
                    f"{ANALYZED_FIELD}, {', '.join(KEYWORD_FIELDS)}, "
                    f"{', '.join(NUMERIC_FIELDS)}"
                )
            return self._analyzed_clause(val)
        raise ValueError(f"query_string: unexpected token {val!r}")

    @staticmethod
    def _analyzed_clause(val: str):
        if "~" in val or "^" in val:
            raise ValueError(
                "query_string: fuzziness (~) and boosts (^) are not supported "
                "— they alter SCORES via libm transcendentals (D10); this "
                "compiler covers the constant-score boolean subset only"
            )
        if val.endswith("*") and len(val) > 1 and "*" not in val[:-1]:
            return Prefix(val[:-1])
        if "*" in val or "?" in val:
            raise ValueError(
                "query_string: only trailing-* wildcards are supported here; "
                "use q_search_wildcard for general patterns"
            )
        return Term(val)

    @classmethod
    def _phrase_clause(cls, inner: str):
        words = tuple(w for w in inner.split(" ") if w)
        if not words:
            raise ValueError("query_string: empty phrase")
        for w in words:
            if any(ch in w for ch in "*?~^"):
                raise ValueError(
                    f"query_string: wildcard/fuzzy/boost syntax inside a "
                    f"phrase is not supported, got {w!r}"
                )
        return Phrase(words) if len(words) > 1 else Term(words[0])

    @staticmethod
    def _rangeable(field: str) -> None:
        if field not in KEYWORD_FIELDS and field not in NUMERIC_FIELDS:
            raise ValueError(
                f"query_string: field {field!r} does not support ranges; "
                f"supported: {', '.join(KEYWORD_FIELDS + NUMERIC_FIELDS)}"
            )

    @staticmethod
    def _num(field: str, raw: str) -> int:
        try:
            return int(raw)
        except ValueError:
            raise ValueError(
                f"query_string: numeric field {field!r} requires an integer "
                f"value, got {raw!r}"
            ) from None

    @classmethod
    def _endpoint(cls, field: str, raw: str):
        """Parse one range endpoint: '*' = unbounded, else typed by field."""
        if raw == "*":
            return None
        if not raw:
            raise ValueError(
                f"query_string: empty range endpoint for field {field!r}"
            )
        if field in NUMERIC_FIELDS:
            return cls._num(field, raw)
        if any(ch in raw for ch in ":*?~^\"'"):
            raise ValueError(
                f"query_string: bad range endpoint {raw!r} for field {field!r}"
            )
        return raw

    @classmethod
    def _range_clause(cls, field: str, rng: str):
        cls._rangeable(field)
        lo_incl, hi_incl = rng[0] == "[", rng[-1] == "]"
        parts = rng[1:-1].split(" TO ")
        if len(parts) != 2 or not parts[0].strip() or not parts[1].strip():
            raise ValueError(
                f"query_string: range for {field!r} must be "
                f"'[lo TO hi]' (or {{..}} ends), got {rng!r}"
            )
        lo = cls._endpoint(field, parts[0].strip())
        hi = cls._endpoint(field, parts[1].strip())
        return FieldRange(field, lo, hi, lo_incl, hi_incl)

    @classmethod
    def _cmp_clause(cls, field: str, rest: str):
        cls._rangeable(field)
        for op in (">=", "<=", ">", "<"):  # two-char ops first
            if rest.startswith(op):
                v = cls._endpoint(field, rest[len(op):])
                if v is None:
                    raise ValueError(
                        f"query_string: comparison on {field!r} needs a "
                        f"value, got {rest!r}"
                    )
                if op[0] == ">":
                    return FieldRange(field, v, None, op == ">=", True)
                return FieldRange(field, None, v, True, op == "<=")
        raise ValueError(f"query_string: bad comparison {rest!r} on {field!r}")


def parse(q: str):
    """Parse an ES query_string expression into the module AST. Adjacent
    clauses combine with OR (ES default_operator); NOT and '-' are must_not."""
    toks = _lex(q)
    if not toks:
        raise ValueError("query_string: empty query")
    return _Parser(toks).parse()


# ---------------------------------------------------------------- two renderings


def _leaf(pred: Column) -> Column:
    """Two-valued ES leaf semantics: a NULL field (missing in ES terms) never
    matches a positive clause, so its negation ALWAYS matches (must_not over
    a missing field). coalesce(P, FALSE) makes every boolean op classical."""
    return F.coalesce(pred, F.lit(False))


def compile_spark(node, tk: Column) -> Column:
    """Render the AST as a pyspark boolean Column over token array ``tk``.
    Every leaf is two-valued (see _leaf) — NULL columns behave as ES missing
    fields, not as SQL three-valued unknowns."""
    if isinstance(node, Term):
        return _leaf(F.array_contains(tk, node.word))
    if isinstance(node, Prefix):
        return _leaf(F.exists(tk, lambda t: t.startswith(node.prefix)))
    if isinstance(node, Phrase):
        n = len(node.words)
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1)))

        def match_at(i):
            c = F.try_element_at(tk, i) == node.words[0]
            for j, w in enumerate(node.words[1:], start=1):
                c = c & (F.try_element_at(tk, i + j) == w)
            return c
        return _leaf(F.exists(idx, match_at))
    if isinstance(node, FieldTerm):
        # keyword/numeric field: exact column equality — resolved against the
        # row, not the token array (the ES keyword-vs-analyzed mapping split)
        return _leaf(F.col(node.field) == F.lit(node.value))
    if isinstance(node, FieldRange):
        c = F.col(node.field)
        if node.lo is None and node.hi is None:
            return c.isNotNull()  # ES exists query
        conds = []
        if node.lo is not None:
            conds.append(c >= F.lit(node.lo) if node.lo_incl else c > F.lit(node.lo))
        if node.hi is not None:
            conds.append(c <= F.lit(node.hi) if node.hi_incl else c < F.lit(node.hi))
        out = conds[0]
        for extra in conds[1:]:
            out = out & extra
        return _leaf(out)
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


def _sql_lit(v) -> str:
    return str(v) if isinstance(v, int) else f"'{_sq(v)}'"


def compile_sql(node, tk: str = "tk") -> str:
    """Render the AST as a DuckDB boolean over token list column ``tk`` —
    the oracle twin of compile_spark, generated from the SAME tree. Leaves
    carry the same COALESCE(P, FALSE) two-valued wrapper."""
    if isinstance(node, Term):
        return f"COALESCE(list_contains({tk}, '{_sq(node.word)}'), FALSE)"
    if isinstance(node, Prefix):
        return (
            f"COALESCE(len(list_filter({tk}, x -> x LIKE "
            f"'{_sq(node.prefix)}%')) > 0, FALSE)"
        )
    if isinstance(node, Phrase):
        n = len(node.words)
        conds = " AND ".join(
            f"{tk}[i + {j}] = '{_sq(w)}'" if j else f"{tk}[i] = '{_sq(w)}'"
            for j, w in enumerate(node.words)
        )
        return (
            f"COALESCE(len(list_filter(generate_series(1, greatest(len({tk}) "
            f"- {n - 1}, 1)), i -> {conds})) > 0, FALSE)"
        )
    if isinstance(node, FieldTerm):
        return f"COALESCE({node.field} = {_sql_lit(node.value)}, FALSE)"
    if isinstance(node, FieldRange):
        if node.lo is None and node.hi is None:
            return f"({node.field} IS NOT NULL)"
        conds = []
        if node.lo is not None:
            conds.append(
                f"{node.field} {'>=' if node.lo_incl else '>'} {_sql_lit(node.lo)}"
            )
        if node.hi is not None:
            conds.append(
                f"{node.field} {'<=' if node.hi_incl else '<'} {_sql_lit(node.hi)}"
            )
        return f"COALESCE(({' AND '.join(conds)}), FALSE)"
    if isinstance(node, Not):
        return f"(NOT {compile_sql(node.child, tk)})"
    if isinstance(node, And):
        return "(" + " AND ".join(compile_sql(c, tk) for c in node.children) + ")"
    if isinstance(node, Or):
        return "(" + " OR ".join(compile_sql(c, tk) for c in node.children) + ")"
    raise TypeError(f"unknown node {node!r}")


# ------------------------------------------------------------------- registry op

# exercises every grammar production: fielded phrase (text:"the table"),
# parens, AND/OR, NOT, analyzed-field prefix (text:fa*), keyword exact match
# (lang:), numeric range with mixed brackets (n_chars:[150 TO 540}), keyword
# lexicographic comparison (source:<src2 — matches src0/src1/src10..19, the
# STRING ordering, deliberately not the numeric one)
QS_QUERY = (
    '(text:"the table" OR (scan AND sort)) AND NOT slow AND text:fa* '
    "AND NOT lang:zh AND n_chars:[150 TO 540} AND source:<src2"
)
_QS_AST = parse(QS_QUERY)


def _toks() -> Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def keyword_fields_used(node) -> set[str]:
    """Row-level columns (keyword + numeric) the compiled predicate will
    reference — the operator projects exactly these (plus the token array),
    keeping column pruning tight for queries that use no field prefixes."""
    if isinstance(node, (FieldTerm, FieldRange)):
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
    SELECT doc_id, lang, source, n_chars,
           list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
)
WHERE {compile_sql(_QS_AST)}
"""


QUERIES = {"q_search_querystring": q_search_querystring}
ORACLES = {"q_search_querystring": SQL_SEARCH_QUERYSTRING}
