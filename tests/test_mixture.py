"""Mixture-materialization tests: DuckDB-oracle hash parity for the twins,
hand-built quota/repeat semantics, realized-share convergence, edges."""

from __future__ import annotations

import pytest

from hbase_observer_es_spark.operators.mixture import (
    MIX_FACTORS,
    PPM,
    SQL_MIX_REALIZE,
    SQL_MIX_SELECT,
    q_mix_realize,
    q_mix_select,
    realize_mixture,
    select_top_per_group,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_con


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


def test_mix_select_matches_oracle(spark, con):
    r = compare("q_mix_select", q_mix_select(spark, SF_ORACLE), con, SQL_MIX_SELECT)
    assert r.ok, r.detail


def test_mix_realize_matches_oracle(spark, con):
    r = compare(
        "q_mix_realize", q_mix_realize(spark, SF_ORACLE), con, SQL_MIX_REALIZE
    )
    assert r.ok, r.detail


def test_select_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 30), (3, "a", 30), (4, "b", 5)],
        "doc_id long, grp string, score long",
    )
    got = {
        (r["grp"], r["rnk"]): r["doc_id"]
        for r in select_top_per_group(df, "grp", "score", 2).collect()
    }
    # score desc, id asc on the 30-30 tie
    assert got == {("a", 1): 2, ("a", 2): 3, ("b", 1): 4}
    # per-group dict quotas; an UNLISTED group contributes nothing
    only_a = select_top_per_group(df, "grp", "score", {"a": 1}).collect()
    assert [(r["grp"], r["doc_id"]) for r in only_a] == [("a", 2)]


def test_realize_semantics(spark):
    df = spark.createDataFrame(
        [(i, "up") for i in range(50)] + [(i + 100, "down") for i in range(50)],
        "doc_id long, grp string",
    )
    out = realize_mixture(
        df, {"up": 2_000_000, "down": 400_000}, group_col="grp"
    ).collect()
    ups = [r for r in out if r["grp"] == "up"]
    downs = [r for r in out if r["grp"] == "down"]
    # whole factor 2.0: every doc exactly twice, rep_idx 1..2
    assert len(ups) == 100 and all(r["n_repeats"] == 2 for r in ups)
    assert sorted({r["rep_idx"] for r in ups}) == [1, 2]
    # pure fractional 0.4: a deterministic subset survives once
    assert all(r["n_repeats"] == 1 for r in downs)
    assert 0 < len(downs) < 50
    # rerun-stability: identical output both times
    again = realize_mixture(
        df, {"up": 2_000_000, "down": 400_000}, group_col="grp"
    ).collect()
    key = lambda r: (r["doc_id"], r["rep_idx"])
    assert sorted(map(key, out)) == sorted(map(key, again))


def test_realized_share_converges(spark):
    # hash uniformity: with many ids, the realized fraction approaches the
    # fractional part (measured, not assumed — a biased coin would skew mixes)
    n = 4000
    df = spark.createDataFrame([(i, "g") for i in range(n)], "doc_id long, grp string")
    out = realize_mixture(df, {"g": 300_000}, group_col="grp").count()
    assert abs(out / n - 0.3) < 0.03


def test_unlisted_group_drops_and_zero_factor(spark):
    df = spark.createDataFrame(
        [(1, "keep"), (2, "other")], "doc_id long, grp string"
    )
    out = realize_mixture(df, {"keep": 1_000_000}, group_col="grp").collect()
    assert [(r["doc_id"], r["grp"]) for r in out] == [(1, "keep")]
    assert realize_mixture(df, {"keep": 0}, group_col="grp").count() == 0


def test_validation(spark):
    df = spark.createDataFrame([(1, "a", 1)], "doc_id long, grp string, score long")
    with pytest.raises(ValueError, match="quota must be"):
        select_top_per_group(df, "grp", "score", 0)
    with pytest.raises(ValueError, match="quota dict is empty"):
        select_top_per_group(df, "grp", "score", {})
    with pytest.raises(ValueError, match="negative quota"):
        select_top_per_group(df, "grp", "score", {"a": -1})
    with pytest.raises(ValueError, match="factor_ppm is empty"):
        realize_mixture(df, {}, group_col="grp")
    with pytest.raises(ValueError, match="negative factor_ppm"):
        realize_mixture(df, {"a": -5}, group_col="grp")


def test_null_id_fails_loud(spark):
    # a NULL id would otherwise vanish SILENTLY (NULL coin -> NULL repeats)
    df = spark.createDataFrame([(1, "a"), (None, "a")], "doc_id long, grp string")
    with pytest.raises(Exception, match="NULL 'doc_id'"):
        realize_mixture(df, {"a": 1_000_000}, group_col="grp").collect()


def test_fixture_recipe_directions(spark):
    # en 1.0x passes through; fr 2.5x grows; zh 0.75x shrinks
    from hbase_observer_es_spark.io import table
    from pyspark.sql import functions as F

    base = {
        r["lang"]: r["n"]
        for r in table(spark, SF_ORACLE, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = {
        r["lang"]: r["n"]
        for r in q_mix_realize(spark, SF_ORACLE)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out["en"] == base["en"]
    assert out["fr"] > 2 * base["fr"]
    assert out["zh"] < base["zh"]
    assert MIX_FACTORS["fr"] == 2_500_000 and PPM == 1_000_000
