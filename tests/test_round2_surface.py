"""Behavioral tests for the round-2 surface additions, beyond the oracle
hash-match (which tests/test_oracle.py already parametrizes for every query):
the invariants each operator promises in its docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_observer_es_spark.operators.multimodal import RESIZE_TARGET, q_mm_resize
from hbase_observer_es_spark.operators.relational_ext import q_agg_stats
from hbase_observer_es_spark.operators.search import (
    MLT_DOC_ID,
    MLT_MAX_QUERY_TERMS,
    q_search_mlt,
)
from hbase_observer_es_spark.operators.similarity import K, q_sim_knn, q_sim_lsh
from hbase_observer_es_spark.io import table

from .conftest import SF_ORACLE


def test_resize_fits_target_preserving_aspect(spark):
    """Longest side lands exactly on RESIZE_TARGET; the short side stays ≥1 and
    never exceeds it — the fit-to-box contract of every thumbnailer."""
    bad = (
        q_mm_resize(spark, SF_ORACLE)
        .filter(
            (F.greatest("out_w", "out_h") != RESIZE_TARGET)
            | (F.least("out_w", "out_h") < 1)
        )
        .count()
    )
    assert bad == 0


def test_mlt_excludes_probe_and_bounds_terms(spark):
    rows = q_search_mlt(spark, SF_ORACLE).collect()
    assert rows, "MLT returned nothing"
    assert all(r.doc_id != MLT_DOC_ID for r in rows)
    assert all(1 <= r.n_terms <= MLT_MAX_QUERY_TERMS for r in rows)
    # descending-score order with doc_id tie-break is part of the contract
    keys = [(-r.score, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_lsh_scores_are_exact_cosines(spark):
    """LSH may MISS neighbors (bucketing is approximate) but must never
    mis-score one: every returned cos_sim equals the exact brute-force cosine
    for that vec_id, and the LSH ranking is elementwise dominated by the true
    top-k (a max over a candidate SUBSET can never beat the full-corpus max)."""
    exact_rows = q_sim_knn(spark, SF_ORACLE).collect()  # true top-K, desc
    exact = {r.vec_id: r.cos_sim for r in exact_rows}
    lsh = q_sim_lsh(spark, SF_ORACLE).collect()
    assert 0 < len(lsh) <= K
    for r in lsh:
        if r.vec_id in exact:
            assert r.cos_sim == exact[r.vec_id]  # bit-identical, same fold
    # rank-i LSH score can never exceed rank-i exact score
    for i, r in enumerate(lsh):
        assert r.cos_sim <= exact_rows[i].cos_sim


def test_stats_matches_builtin_variance(spark):
    """The decimal-sufficient-statistics variance must agree with Spark's own
    var_pop to float tolerance — same math, different summation strategy."""
    ours = {r.event_type: r for r in q_agg_stats(spark, SF_ORACLE).collect()}
    builtin = {
        r.event_type: r
        for r in table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.var_pop("value").alias("v"), F.stddev_pop("value").alias("s"))
        .collect()
    }
    assert set(ours) == set(builtin)
    for et, r in ours.items():
        assert abs(r.var_pop - builtin[et].v) <= 1e-9 * max(1.0, abs(r.var_pop))
        assert abs(r.std_pop - builtin[et].s) <= 1e-9 * max(1.0, abs(r.std_pop))
