"""Parser + dual-compiler tests for the ES query_string mini-language.

The AST tests need no Spark; the cross-engine equivalence of the two
renderings is exercised end-to-end by the q_search_querystring oracle row and
by the randomized evaluation test here (DuckDB evaluates compile_sql against
a Python reference evaluator over small synthetic token lists)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.query_string import (
    And,
    Not,
    Or,
    Phrase,
    Prefix,
    Term,
    compile_sql,
    parse,
)


def test_precedence_and_grouping():
    ast = parse('("the table" OR (scan AND sort)) AND NOT slow AND fa*')
    assert ast == And(
        (
            Or((Phrase(("the", "table")), And((Term("scan"), Term("sort"))))),
            Not(Term("slow")),
            Prefix("fa"),
        )
    )


def test_adjacency_is_or():
    # ES default_operator=OR: bare adjacency ORs clauses
    assert parse("scan sort") == Or((Term("scan"), Term("sort")))
    assert parse("scan sort AND big") == Or(
        (Term("scan"), And((Term("sort"), Term("big"))))
    )


def test_minus_is_not_and_single_word_phrase_folds():
    assert parse("-slow") == Not(Term("slow"))
    assert parse('"scan"') == Term("scan")


@pytest.mark.parametrize(
    "bad", ["", "(scan", "scan)", 'sc?n', "mid*dle*", '""', "AND"]
)
def test_rejects_malformed(bad):
    with pytest.raises(ValueError):
        parse(bad)


def _eval(node, toks: list[str]) -> bool:
    if isinstance(node, Term):
        return node.word in toks
    if isinstance(node, Prefix):
        return any(t.startswith(node.prefix) for t in toks)
    if isinstance(node, Phrase):
        n = len(node.words)
        return any(
            tuple(toks[i : i + n]) == node.words for i in range(len(toks) - n + 1)
        )
    if isinstance(node, Not):
        return not _eval(node.child, toks)
    if isinstance(node, And):
        return all(_eval(c, toks) for c in node.children)
    if isinstance(node, Or):
        return any(_eval(c, toks) for c in node.children)
    raise TypeError(node)


_WORDS = ["scan", "sort", "slow", "fast", "the", "table"]

_queries = st.sampled_from(
    [
        "scan",
        "fa*",
        '"the table"',
        '"the table scan"',
        "scan AND sort",
        "scan OR slow",
        "-slow",
        "scan sort -slow",
        '("the table" OR (scan AND sort)) AND NOT slow AND fa*',
        "NOT (scan OR sort) table",
    ]
)


@given(q=_queries, toks=st.lists(st.sampled_from(_WORDS), max_size=6))
@settings(max_examples=300, deadline=None)
def test_sql_rendering_matches_reference_eval(q, toks):
    """compile_sql run by DuckDB must agree with the direct AST evaluation for
    every query shape and token list — the oracle-side half of the dual
    compiler, checked without Spark in the loop."""
    ast = parse(q)
    lit = "[" + ", ".join(f"'{t}'" for t in toks) + "]"
    got = duckdb.sql(
        f"SELECT {compile_sql(ast)} FROM (SELECT {lit}::VARCHAR[] AS tk)"
    ).fetchone()[0]
    assert bool(got) == _eval(ast, toks), (q, toks)


def test_field_prefixes_parse():
    """D16 partial-close: text: resolves to the analyzed field (same
    term/prefix rules), lang:/source: are keyword exact matches."""
    from hbase_observer_es_spark.operators.query_string import FieldTerm

    assert parse("text:scan") == Term("scan")
    assert parse("text:fa*") == Prefix("fa")
    assert parse("lang:zh") == FieldTerm("lang", "zh")
    assert parse("source:src0") == FieldTerm("source", "src0")
    assert parse("scan AND NOT lang:zh") == And(
        (Term("scan"), Not(FieldTerm("lang", "zh")))
    )


@pytest.mark.parametrize(
    "bad",
    [
        "title:foo",       # unknown field — fail closed
        "lang:",           # empty value
        "lang:z*",         # keyword fields take exact values
        "lang:a:b",        # nested colon
        "text:mid*dle",    # analyzed rules still reject embedded wildcards
        "text:",           # empty analyzed value
    ],
)
def test_field_prefix_rejections(bad):
    with pytest.raises(ValueError):
        parse(bad)


def test_keyword_field_sql_rendering():
    """compile_sql for keyword fields must evaluate as exact column equality
    in DuckDB — checked against rows carrying tk + keyword columns."""
    ast = parse('scan AND NOT lang:zh')
    got = duckdb.sql(
        f"SELECT {compile_sql(ast)} FROM (SELECT ['scan']::VARCHAR[] AS tk, "
        "'es' AS lang, 'src0' AS source)"
    ).fetchone()[0]
    assert got is True
    got2 = duckdb.sql(
        f"SELECT {compile_sql(ast)} FROM (SELECT ['scan']::VARCHAR[] AS tk, "
        "'zh' AS lang, 'src0' AS source)"
    ).fetchone()[0]
    assert got2 is False


# -- field-prefix dual-compiler equivalence (randomized) ----------------------

from hbase_observer_es_spark.operators.query_string import FieldTerm  # noqa: E402


def _eval_row(node, toks: list[str], lang: str, source: str) -> bool:
    """Reference evaluator over a full row (token list + keyword columns) —
    extends _eval with the FieldTerm production."""
    if isinstance(node, FieldTerm):
        return {"lang": lang, "source": source}[node.field] == node.value
    if isinstance(node, Not):
        return not _eval_row(node.child, toks, lang, source)
    if isinstance(node, And):
        return all(_eval_row(c, toks, lang, source) for c in node.children)
    if isinstance(node, Or):
        return any(_eval_row(c, toks, lang, source) for c in node.children)
    return _eval(node, toks)


_FIELD_QUERIES = st.sampled_from(
    [
        "lang:es",
        "source:src1",
        "scan AND lang:es",
        "scan OR NOT source:src0",
        "-lang:zh AND (scan OR sort)",
        'text:fa* AND NOT lang:zh',
        '("the table" OR text:scan) AND source:src1',
        "lang:es lang:zh",  # adjacency = OR across keyword clauses
    ]
)


@given(
    q=_FIELD_QUERIES,
    toks=st.lists(st.sampled_from(_WORDS), max_size=6),
    lang=st.sampled_from(["es", "zh", "de"]),
    source=st.sampled_from(["src0", "src1"]),
)
@settings(max_examples=300, deadline=None)
def test_field_prefix_sql_rendering_matches_reference_eval(q, toks, lang, source):
    """The D16 field-prefix production through the same dual-compiler check:
    DuckDB evaluating compile_sql over a (tk, lang, source) row must agree
    with the direct AST evaluation for every query shape."""
    ast = parse(q)
    lit = "[" + ", ".join(f"'{t}'" for t in toks) + "]"
    got = duckdb.sql(
        f"SELECT {compile_sql(ast)} FROM (SELECT {lit}::VARCHAR[] AS tk, "
        f"'{lang}' AS lang, '{source}' AS source)"
    ).fetchone()[0]
    assert bool(got) == _eval_row(ast, toks, lang, source), (q, toks, lang, source)
