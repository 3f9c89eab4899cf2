"""Corpus-drift tests: DuckDB-oracle hash parity for the registration-ready
twins, hand-computed exact arithmetic, identity/bounds properties, edges."""

from __future__ import annotations

from decimal import Decimal

import pytest

from hbase_observer_es_spark.operators.drift import (
    SQL_CORPUS_DRIFT,
    SQL_CORPUS_DRIFT_TV,
    drift_summary,
    q_corpus_drift,
    q_corpus_drift_tv,
    term_counts,
    unigram_drift,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_con


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


def test_corpus_drift_matches_oracle(spark, con):
    r = compare("q_corpus_drift", q_corpus_drift(spark, SF_ORACLE), con, SQL_CORPUS_DRIFT)
    assert r.ok, r.detail


def test_corpus_drift_tv_matches_oracle(spark, con):
    r = compare(
        "q_corpus_drift_tv", q_corpus_drift_tv(spark, SF_ORACLE), con, SQL_CORPUS_DRIFT_TV
    )
    assert r.ok, r.detail


def _docs(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_hand_computed_drift(spark):
    # A: "x x y" (N_a=3: x:2 y:1); B: "x y y y" (N_b=4: x:1 y:3)
    a = _docs(spark, "x x y")
    b = _docs(spark, "x y y y")
    rows = {r["term"]: r for r in unigram_drift(a, b, 10).collect()}
    # dshift(x) = 2*4 - 1*3 = 5 ; dshift(y) = 1*4 - 3*3 = -5
    assert rows["x"]["dshift"] == Decimal(5) and rows["x"]["c_a"] == 2
    assert rows["y"]["dshift"] == Decimal(-5) and rows["y"]["c_b"] == 3
    # tie on |dshift|: term ascending puts x first
    assert rows["x"]["rnk"] == 1 and rows["y"]["rnk"] == 2
    s = drift_summary(a, b).head()
    # tv_num = |5| + |-5| = 10 ; tv_den = 2*3*4 = 24 ; TV = 10/24
    assert s["tv_num"] == Decimal(10) and s["tv_den"] == Decimal(24)
    assert s["n_tok_a"] == Decimal(3) and s["n_tok_b"] == Decimal(4)
    assert s["n_terms_a"] == 2 and s["n_terms_b"] == 2


def test_disjoint_vocab_and_missing_terms(spark):
    a = _docs(spark, "only in a")  # N_a=3, three distinct terms
    b = _docs(spark, "solo")  # N_b=1
    rows = {r["term"]: r for r in unigram_drift(a, b, 10).collect()}
    assert rows["solo"]["c_a"] == 0 and rows["solo"]["c_b"] == 1
    assert rows["solo"]["dshift"] == Decimal(-3)  # 0*1 - 1*3
    assert rows["only"]["c_b"] == 0 and rows["only"]["dshift"] == Decimal(1)
    s = drift_summary(a, b).head()
    # totally disjoint: TV = 1 exactly -> tv_num == tv_den/2... num=3*1+3*1? per
    # term: only/in/a each |1*1-0| = 1 (x3), solo |0-1*3| = 3 -> num 6, den 6
    assert s["tv_num"] == Decimal(6) and s["tv_den"] == Decimal(6)


def test_identical_corpora_zero_drift(spark):
    a = _docs(spark, "same words here", "and here")
    s = drift_summary(a, a).head()
    assert s["tv_num"] == Decimal(0)
    top = unigram_drift(a, a, 3).collect()
    assert all(r["dshift"] == Decimal(0) for r in top)


def test_null_and_empty_text(spark):
    a = spark.createDataFrame([(None,), ("",), ("w",)], "text string")
    assert {(r["term"], r["c"]) for r in term_counts(a).collect()} == {("w", 1)}


def test_top_k_validation(spark):
    a = _docs(spark, "x")
    with pytest.raises(ValueError, match="top_k"):
        unigram_drift(a, a, 0)


def test_empty_corpus_fails_loud(spark):
    a = _docs(spark, "some words")
    empty = spark.createDataFrame([(None,), ("",)], "text string")
    with pytest.raises(Exception, match="corpus B has no tokens"):
        unigram_drift(a, empty, 3).collect()
    with pytest.raises(Exception, match="corpus A has no tokens"):
        drift_summary(empty, a).collect()
    both = spark.createDataFrame([], "text string")
    with pytest.raises(Exception, match="both corpora are empty"):
        drift_summary(both, both).collect()


def test_each_corpus_scanned_once(spark):
    # totals come from the joined vocab frame, not a second agg of the raw
    # corpora — each input must appear exactly once in the physical plan
    a = _docs(spark, "x x y")
    b = _docs(spark, "x y y y")
    plan = drift_summary(a, b)._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
    assert n_scans == 2, plan


def test_tv_bounds_on_fixture(spark):
    s = q_corpus_drift_tv(spark, SF_ORACLE).head()
    assert Decimal(0) < s["tv_num"] <= s["tv_den"]
    tv = float(s["tv_num"]) / float(s["tv_den"])
    assert 0.0 < tv <= 1.0
