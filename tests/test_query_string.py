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


# -- D16 second close (round 9): ranges, comparisons, fielded phrases ---------

from hbase_observer_es_spark.operators.query_string import FieldRange  # noqa: E402


def test_ranges_and_comparisons_parse():
    assert parse("n_chars:[150 TO 540]") == FieldRange("n_chars", 150, 540, True, True)
    assert parse("n_chars:{150 TO 540}") == FieldRange("n_chars", 150, 540, False, False)
    assert parse("n_chars:[150 TO 540}") == FieldRange("n_chars", 150, 540, True, False)
    assert parse("n_chars:[* TO 540]") == FieldRange("n_chars", None, 540, True, True)
    assert parse("n_chars:[150 TO *]") == FieldRange("n_chars", 150, None, True, True)
    # both-unbounded = ES exists query
    assert parse("lang:[* TO *]") == FieldRange("lang", None, None, True, True)
    assert parse("n_chars:>100") == FieldRange("n_chars", 100, None, False, True)
    assert parse("n_chars:>=100") == FieldRange("n_chars", 100, None, True, True)
    assert parse("n_chars:<100") == FieldRange("n_chars", None, 100, True, False)
    assert parse("n_chars:<=100") == FieldRange("n_chars", None, 100, True, True)
    # keyword fields range lexicographically
    assert parse("source:[src0 TO src2}") == FieldRange("source", "src0", "src2", True, False)
    assert parse("lang:>=es") == FieldRange("lang", "es", None, True, True)


def test_fielded_phrase_and_numeric_term_parse():
    assert parse('text:"the table"') == Phrase(("the", "table"))
    assert parse('text:"scan"') == Term("scan")
    # quoted keyword value is exact-match verbatim (spaces allowed)
    from hbase_observer_es_spark.operators.query_string import FieldTerm
    assert parse('source:"src one"') == FieldTerm("source", "src one")
    # numeric exact term
    assert parse("n_chars:157") == FieldTerm("n_chars", 157)
    assert parse("doc_id:42") == FieldTerm("doc_id", 42)


@pytest.mark.parametrize(
    "bad",
    [
        "fox~",                 # fuzziness — D10 libm, explicitly rejected
        "fox~2",
        "fox^2",                # boost — same
        "text:fox~1",
        '"quick fox~"',         # fuzzy inside a phrase
        "n_chars:[150 TO]",     # malformed range
        "n_chars:[TO 540]",
        "n_chars:[150 to 540]", # ES requires uppercase TO
        "n_chars:[a TO b]",     # non-numeric endpoints on a numeric field
        "n_chars:abc",          # non-numeric exact term
        "n_chars:>",            # comparison without a value
        "lang:>",
        "text:[a TO b]",        # analyzed field has no range semantics
        "title:[1 TO 2]",       # unknown field
        'n_chars:"42"',         # numeric fields take unquoted values
        'text:""',              # empty fielded phrase
        "lang:[a TO ]",
    ],
)
def test_range_and_fuzz_rejections(bad):
    with pytest.raises(ValueError):
        parse(bad)


# -- NULL semantics: leaves are two-valued (ES missing-field rule) ------------


def test_not_keyword_matches_null_rows_in_sql():
    """ADVICE r9 repro: NOT lang:zh must MATCH a row whose lang is NULL (ES
    must_not matches documents missing the field); three-valued logic would
    drop it. Checked in the DuckDB rendering here, in Spark below."""
    ast = parse("scan AND NOT lang:zh")
    got = duckdb.sql(
        f"SELECT {compile_sql(ast)} FROM (SELECT ['scan']::VARCHAR[] AS tk, "
        "NULL::VARCHAR AS lang, 'src0' AS source)"
    ).fetchone()[0]
    assert got is True
    # and the positive clause never matches NULL
    got2 = duckdb.sql(
        f"SELECT {compile_sql(parse('lang:zh'))} FROM "
        "(SELECT ['scan']::VARCHAR[] AS tk, NULL::VARCHAR AS lang)"
    ).fetchone()[0]
    assert got2 is False


def test_null_semantics_spark_matches_sql(spark):
    """The Spark rendering of the same two-valued rule: a NULL keyword row
    survives NOT lang:zh and a NULL text row fails every analyzed clause but
    passes its negation."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from hbase_observer_es_spark.operators.query_string import compile_spark

    df = spark.createDataFrame(
        [(1, "scan fast", "en"), (2, "scan slow", None), (3, None, "zh")],
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]),
    )
    tk = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    dd = df.select("doc_id", "lang", F.explode(F.array(tk)).alias("tk"))

    def ids(q):
        pred = compile_spark(parse(q), F.col("tk"))
        return sorted(r.doc_id for r in dd.filter(pred).collect())

    assert ids("scan AND NOT lang:zh") == [1, 2]   # NULL lang row 2 survives
    assert ids("lang:zh") == [3]
    assert ids("NOT scan") == [3]                  # NULL text matches negation
    assert ids("scan") == [1, 2]
    assert ids("lang:[* TO *]") == [1, 3]          # exists query skips NULL


# -- randomized dual-compiler equivalence over ranges + NULLs -----------------


def _eval_row9(node, toks, lang, source, n_chars):
    """Reference evaluator extended with FieldRange and None (missing-field)
    columns — classical two-valued Boolean, the ES semantics."""
    if isinstance(node, FieldRange):
        v = {"lang": lang, "source": source, "n_chars": n_chars, "doc_id": 7}[node.field]
        if node.lo is None and node.hi is None:
            return v is not None
        if v is None:
            return False
        ok = True
        if node.lo is not None:
            ok = ok and (v >= node.lo if node.lo_incl else v > node.lo)
        if node.hi is not None:
            ok = ok and (v <= node.hi if node.hi_incl else v < node.hi)
        return ok
    if isinstance(node, FieldTerm):
        v = {"lang": lang, "source": source, "n_chars": n_chars, "doc_id": 7}[node.field]
        return v is not None and v == node.value
    if isinstance(node, Not):
        return not _eval_row9(node.child, toks, lang, source, n_chars)
    if isinstance(node, And):
        return all(_eval_row9(c, toks, lang, source, n_chars) for c in node.children)
    if isinstance(node, Or):
        return any(_eval_row9(c, toks, lang, source, n_chars) for c in node.children)
    return _eval(node, toks)


_RANGE_QUERIES = st.sampled_from(
    [
        "n_chars:[100 TO 300]",
        "n_chars:{100 TO 300}",
        "n_chars:[* TO 200}",
        "n_chars:>150",
        "n_chars:<=250 AND scan",
        "lang:[es TO zh}",
        "source:[src0 TO src2}",
        "lang:[* TO *]",
        "NOT lang:zh",
        "scan AND NOT lang:zh",
        'text:"the table" OR n_chars:>=300',
        "NOT (lang:es OR n_chars:<150)",
        "doc_id:7 OR n_chars:157",
        "-source:src1 AND (scan OR n_chars:[150 TO *])",
    ]
)


@given(
    q=_RANGE_QUERIES,
    toks=st.lists(st.sampled_from(_WORDS), max_size=6),
    lang=st.sampled_from(["es", "zh", None]),
    source=st.sampled_from(["src0", "src1", "src10", None]),
    n_chars=st.sampled_from([100, 157, 250, 300, None]),
)
@settings(max_examples=400, deadline=None)
def test_range_sql_rendering_matches_reference_eval(q, toks, lang, source, n_chars):
    """Round-9 productions (ranges, comparisons, fielded phrases) and NULL
    columns through the dual-compiler check: DuckDB evaluating compile_sql
    must agree with the classical reference evaluation on every row shape,
    including rows with missing (NULL) fields."""
    ast = parse(q)
    lit = "[" + ", ".join(f"'{t}'" for t in toks) + "]"
    sl = "NULL::VARCHAR" if lang is None else f"'{lang}'"
    ss = "NULL::VARCHAR" if source is None else f"'{source}'"
    sn = "NULL::BIGINT" if n_chars is None else str(n_chars)
    got = duckdb.sql(
        f"SELECT {compile_sql(ast)} FROM (SELECT {lit}::VARCHAR[] AS tk, "
        f"{sl} AS lang, {ss} AS source, {sn} AS n_chars, 7::BIGINT AS doc_id)"
    ).fetchone()[0]
    assert bool(got) == _eval_row9(ast, toks, lang, source, n_chars), (
        q, toks, lang, source, n_chars,
    )


def test_range_spark_rendering_matches_reference_eval(spark):
    """The SPARK half of the round-9 dual-compiler check, batched: every
    range/phrase/NULL query shape compiled to a boolean column, evaluated in
    ONE Spark job over the cross-product of row shapes (token lists x lang x
    source x n_chars incl. NULLs), and compared cell-by-cell to the classical
    reference evaluator. Complements the DuckDB-side hypothesis test with the
    identical truth table, so both renderings are pinned to the same
    semantics — not merely to each other."""
    import itertools

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from hbase_observer_es_spark.operators.query_string import compile_spark

    toks_choices = [[], ["scan"], ["the", "table"], ["scan", "slow", "fast"]]
    langs = ["es", "zh", None]
    sources = ["src0", "src10", None]
    n_chars_choices = [100, 157, 300, None]
    rows = [
        (i, t, lg, sr, nc, 7)
        for i, (t, lg, sr, nc) in enumerate(
            itertools.product(toks_choices, langs, sources, n_chars_choices)
        )
    ]
    schema = T.StructType([
        T.StructField("rid", T.LongType()),
        T.StructField("tk", T.ArrayType(T.StringType())),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("doc_id", T.LongType()),
    ])
    df = spark.createDataFrame(rows, schema)

    queries = [
        "n_chars:[100 TO 300]",
        "n_chars:{100 TO 300}",
        "n_chars:[* TO 200}",
        "n_chars:>150",
        "n_chars:<=250 AND scan",
        "lang:[es TO zh}",
        "source:[src0 TO src2}",
        "lang:[* TO *]",
        "NOT lang:zh",
        "scan AND NOT lang:zh",
        'text:"the table" OR n_chars:>=300',
        "NOT (lang:es OR n_chars:<150)",
        "doc_id:7 OR n_chars:157",
        "-source:src1 AND (scan OR n_chars:[150 TO *])",
        "NOT scan",
        'source:"src one" OR lang:es',
    ]
    cols = [
        compile_spark(parse(q), F.col("tk")).alias(f"q{i}")
        for i, q in enumerate(queries)
    ]
    got = {r["rid"]: r for r in df.select("rid", *cols).collect()}
    for rid, tk, lang, source, n_chars, _doc in rows:
        for i, q in enumerate(queries):
            want = _eval_row9(parse(q), tk, lang, source, n_chars)
            assert bool(got[rid][f"q{i}"]) == want, (q, tk, lang, source, n_chars)


def test_negative_integers_consistent_across_productions():
    """Review finding r9: '-5' was accepted in bracket ranges but the lexer
    truncated it out of comparisons and exact terms. All three numeric
    productions now take negative literals; text/keyword values still fail
    closed on a leading '-' (embedded negation is not defined here)."""
    assert parse("n_chars:[-5 TO 10]") == FieldRange("n_chars", -5, 10, True, True)
    assert parse("n_chars:>-5") == FieldRange("n_chars", -5, None, False, True)
    assert parse("n_chars:<=-5") == FieldRange("n_chars", None, -5, True, True)
    from hbase_observer_es_spark.operators.query_string import FieldTerm
    assert parse("n_chars:-5") == FieldTerm("n_chars", -5)
    assert parse("doc_id:-42") == FieldTerm("doc_id", -42)
    for bad in ("lang:-x", "text:-foo", "source:-s"):
        with pytest.raises(ValueError, match="cannot start with"):
            parse(bad)


def test_negative_literal_sql_and_eval_agree():
    ast = parse("n_chars:>-5 AND NOT n_chars:-3")
    got = duckdb.sql(
        f"SELECT {compile_sql(ast)} FROM (SELECT []::VARCHAR[] AS tk, "
        "-3::BIGINT AS n_chars)"
    ).fetchone()[0]
    assert got is False  # -3 > -5 but the NOT -3 clause excludes it
    got2 = duckdb.sql(
        f"SELECT {compile_sql(ast)} FROM (SELECT []::VARCHAR[] AS tk, "
        "0::BIGINT AS n_chars)"
    ).fetchone()[0]
    assert got2 is True
