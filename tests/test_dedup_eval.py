"""LSH-recall evaluation tests: DuckDB-oracle hash parity, count-identity
invariants, the precision-1 check, and driver-side cross-verification
against the two underlying queries it composes."""

from __future__ import annotations

import pytest

from hbase_observer_es_spark.operators.dedup import q_dedup_minhash
from hbase_observer_es_spark.operators.dedup_eval import (
    SQL_DEDUP_LSH_RECALL,
    _truth_pairs,
    q_dedup_lsh_recall,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_con


@pytest.fixture(scope="module")
def report(spark):
    return q_dedup_lsh_recall(spark, SF_ORACLE).head()


def test_matches_oracle(spark):
    con = duckdb_con(SF_ORACLE)
    try:
        r = compare(
            "q_dedup_lsh_recall",
            q_dedup_lsh_recall(spark, SF_ORACLE),
            con,
            SQL_DEDUP_LSH_RECALL,
        )
        assert r.ok, r.detail
    finally:
        con.close()


def test_count_identities_and_nonvacuous(report):
    r = report
    assert r["n_truth"] == r["n_common"] + r["n_missed"]
    assert r["n_found"] == r["n_common"] + r["n_extra"]
    # the fixture has real near-dup shingle pairs — a vacuous 0/0 report
    # would pin nothing
    assert r["n_truth"] > 0 and r["n_found"] > 0


def test_minhash_precision_is_one(report):
    # q_dedup_minhash verifies candidates exactly, so it can MISS pairs but
    # never invent them — n_extra measures (not restates) that claim
    assert report["n_extra"] == 0


def test_counts_cross_verify_against_components(spark, report):
    truth = {
        (r["a_id"], r["b_id"]) for r in _truth_pairs(spark, SF_ORACLE).collect()
    }
    found = {
        (r["a_id"], r["b_id"])
        for r in q_dedup_minhash(spark, SF_ORACLE)
        .select("a_id", "b_id")
        .collect()
    }
    assert report["n_truth"] == len(truth)
    assert report["n_found"] == len(found)
    assert report["n_common"] == len(truth & found)
    assert report["n_missed"] == len(truth - found)
    # found ⊆ truth: the verify step enforces the same threshold over the
    # same shingle space
    assert found <= truth
