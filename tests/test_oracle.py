"""Every registered query vs its DuckDB oracle — the local twin of the driver's
correctness gate. Runs at sf0.001 by default (fast); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to run at the driver's scale."""

from __future__ import annotations

import pytest

from hbase_observer_es_spark.registry import all_oracles, all_queries

from .conftest import SF_ORACLE
from .oracle_harness import compare, duckdb_con

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, con, name):
    df = QUERIES[name](spark, SF_ORACLE)
    res = compare(name, df, con, ORACLES[name])
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    """Queries without an oracle must at least run and have a stable schema."""
    df = QUERIES[name](spark, SF_ORACLE)
    rows = df.collect()
    assert df.columns, name
    assert rows is not None
