"""Property tests for the span_near / intervals position arithmetic.

The oracle harness proves Spark and DuckDB AGREE; these prove the shared
formulation is CORRECT — both engines evaluate the same
flatten(transform(filter)) expression, so a bug in the formulation would
cross-verify green. Reference: a direct Python enumeration of position pairs.
DuckDB evaluates the SQL twin's core expression (cheap — no Spark session).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.span import (
    IV_GAPS,
    SPAN_FIRST,
    SPAN_SECOND,
    SPAN_SLOP,
)

_WORDS = ["key", "value", "row", "scan", "key", "value"]  # hit-heavy vocab
_docs = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12)


def _ref_span_near(toks: list[str]) -> int:
    p1 = [i for i, t in enumerate(toks, 1) if t == SPAN_FIRST]
    p2 = [j for j, t in enumerate(toks, 1) if t == SPAN_SECOND]
    return sum(1 for i in p1 for j in p2 if j > i and j - i <= SPAN_SLOP + 1)


def _ref_intervals(toks: list[str]) -> int:
    p1 = [i for i, t in enumerate(toks, 1) if t == SPAN_FIRST]
    p2 = [j for j, t in enumerate(toks, 1) if t == SPAN_SECOND]
    return sum(
        1 for i in p1 for j in p2 if j != i and abs(j - i) - 1 <= IV_GAPS
    )


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _duck_count(con, toks: list[str], ordered: bool) -> int:
    tk = "[" + ", ".join(f"'{t}'" for t in toks) + "]"
    cond = (
        f"j > i AND j - i <= {SPAN_SLOP + 1}"
        if ordered
        else f"j <> i AND abs(j - i) - 1 <= {IV_GAPS}"
    )
    q = f"""
    WITH pos AS (
        SELECT list_filter(generate_series(1, greatest(len({tk}), 1)),
                           i -> ({tk})[i] = '{SPAN_FIRST}') AS p1,
               list_filter(generate_series(1, greatest(len({tk}), 1)),
                           i -> ({tk})[i] = '{SPAN_SECOND}') AS p2
    )
    SELECT len(flatten(list_transform(p1, i -> list_filter(p2, j -> {cond}))))
    FROM pos
    """
    return con.sql(q).fetchone()[0]


@given(toks=_docs)
@settings(max_examples=120, deadline=None)
def test_span_near_formulation_matches_reference(con, toks):
    assert _duck_count(con, toks, ordered=True) == _ref_span_near(toks)


@given(toks=_docs)
@settings(max_examples=120, deadline=None)
def test_intervals_formulation_matches_reference(con, toks):
    assert _duck_count(con, toks, ordered=False) == _ref_intervals(toks)
