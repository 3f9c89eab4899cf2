"""Profiler tests: DuckDB-oracle hash parity for the registration-ready
twins (same harness discipline as the registry), hand-built correctness,
the exact-vs-approx ndv contract, plan shape, and fail-loud edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_observer_es_spark.operators.profile import (
    SQL_PROFILE_STATS,
    SQL_PROFILE_TOPVALS,
    profile_diff,
    profile_stats,
    q_profile_stats,
    q_profile_topvals,
    top_values,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_con


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


def test_profile_stats_matches_oracle(spark, con):
    r = compare("q_profile_stats", q_profile_stats(spark, SF_ORACLE), con, SQL_PROFILE_STATS)
    assert r.ok, r.detail


def test_profile_topvals_matches_oracle(spark, con):
    r = compare(
        "q_profile_topvals", q_profile_topvals(spark, SF_ORACLE), con, SQL_PROFILE_TOPVALS
    )
    assert r.ok, r.detail


def test_profile_stats_hand_built(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x int, y string"
    )
    got = {r["col_name"]: r for r in profile_stats(df).collect()}
    assert got["x"]["n_rows"] == 4 and got["y"]["n_rows"] == 4
    assert got["x"]["n_null"] == 1 and got["y"]["n_null"] == 1
    assert got["x"]["ndv"] == 2 and got["y"]["ndv"] == 2


def test_profile_stats_empty_table(spark):
    df = spark.createDataFrame([], "x int, y string")
    got = {r["col_name"]: r for r in profile_stats(df).collect()}
    assert got["x"]["n_rows"] == 0 and got["x"]["n_null"] == 0 and got["x"]["ndv"] == 0


def test_approx_ndv_close_and_no_expand(spark):
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 37).alias("m")
    )
    exact = {r["col_name"]: r["ndv"] for r in profile_stats(df).collect()}
    approx = {
        r["col_name"]: r["ndv"] for r in profile_stats(df, exact=False).collect()
    }
    assert exact == {"id": 5000, "m": 37}
    for c in exact:
        assert abs(approx[c] - exact[c]) <= 0.1 * exact[c] + 2, (c, approx[c])
    # the at-scale contract: exact ndv needs an Expand, approx must not
    plan_exact = profile_stats(df)._jdf.queryExecution().executedPlan().toString()
    plan_approx = (
        profile_stats(df, exact=False)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in plan_exact
    assert "Expand" not in plan_approx


def test_top_values_tiebreak_and_null_exclusion(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("c",), ("a",), (None,)], "v string"
    )
    rows = [(r["rnk"], r["value"], r["n"]) for r in top_values(df, 3).collect()]
    # a and b tie at 2 — value ascending puts a first; NULL never appears
    assert sorted(rows) == [(1, "a", 2), (2, "b", 2), (3, "c", 1)]


def test_top_values_skips_vs_rejects_ineligible(spark):
    df = spark.createDataFrame([(1, 2.5, "x")], "i int, d double, s string")
    # columns=None: float silently not profiled
    cols = {r["col_name"] for r in top_values(df, 2).collect()}
    assert cols == {"i", "s"}
    # explicit request: loud
    with pytest.raises(ValueError, match="engine-unstable"):
        top_values(df, 2, columns=["d"])


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="not in"):
        profile_stats(df, columns=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_stats(df, columns=[])
    with pytest.raises(ValueError, match="k must be"):
        top_values(df, 0)
    with pytest.raises(ValueError, match="no eligible"):
        top_values(spark.createDataFrame([(1.0,)], "d double"))
    # a repeated column would silently double its top_values counts
    with pytest.raises(ValueError, match="duplicate"):
        top_values(df, 1, columns=["x", "x"])
    with pytest.raises(ValueError, match="duplicate"):
        profile_stats(df, columns=["x", "x"])


def test_profile_diff(spark):
    prev = profile_stats(
        spark.createDataFrame([(1, "a"), (2, None)], "x int, gone string")
    )
    curr = profile_stats(
        spark.createDataFrame(
            [(1, "p"), (2, "q"), (None, "q")], "x int, fresh string"
        )
    )
    got = {r["col_name"]: r for r in profile_diff(curr, prev).collect()}
    assert got["x"]["status"] == "kept" and got["x"]["d_rows"] == 1
    assert got["x"]["n_null"] == 1 and got["x"]["n_null_prev"] == 0
    assert got["fresh"]["status"] == "added"
    # absence is not emptiness: the missing side stays NULL, not 0
    assert got["fresh"]["n_rows_prev"] is None and got["fresh"]["d_rows"] is None
    assert got["gone"]["status"] == "removed" and got["gone"]["ndv_prev"] == 1
    with pytest.raises(ValueError, match="lacks profile_stats columns"):
        profile_diff(curr, prev.drop("ndv"))


def test_dotted_column_names(spark):
    # generic ingest data has flattened dotted names at top level — the
    # profiler must treat them as plain columns, never struct access
    df = spark.createDataFrame([(1, "a"), (1, None)], ["user.id", "geo.city"])
    stats = {r["col_name"]: r for r in profile_stats(df).collect()}
    assert stats["user.id"]["ndv"] == 1
    assert stats["geo.city"]["n_null"] == 1
    tops = [
        (r["col_name"], r["value"], r["n"]) for r in top_values(df, 1).collect()
    ]
    assert sorted(tops) == [("geo.city", "a", 1), ("user.id", "1", 2)]
