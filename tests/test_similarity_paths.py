"""The two k-NN implementations — JVM fold (oracle-checked) and numpy BLAS
pandas_udf (rows-only) — must return the same neighbors: the float-reordering
ulp drift BLAS introduces may change scores, never the result set here."""

from __future__ import annotations

from hbase_observer_es_spark.operators.similarity import q_sim_knn, q_sim_knn_pudf

from .conftest import SF_ORACLE


def test_numpy_knn_matches_jvm_fold(spark):
    jvm = sorted((r.vec_id, r.label) for r in q_sim_knn(spark, SF_ORACLE).collect())
    np_ = [(r.vec_id, r.label) for r in q_sim_knn_pudf(spark, SF_ORACLE).collect()]
    assert jvm == np_  # pudf output is already vec_id-sorted (oracle contract)
