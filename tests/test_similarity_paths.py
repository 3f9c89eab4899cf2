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


def test_kmeans_trainer_deterministic_and_bounded(spark):
    """train_centroids: at most k cells, full-width centroids, unique cell ids,
    and bit-identical output across runs (no RNG anywhere by construction)."""
    from hbase_observer_es_spark.io import table
    from hbase_observer_es_spark.operators.similarity import (
        EMB_DIM,
        KMEANS_K,
        train_centroids,
    )

    e = table(spark, SF_ORACLE, "embeddings")
    rows = train_centroids(e).collect()
    assert 1 <= len(rows) <= KMEANS_K
    assert all(len(r.centroid) == EMB_DIM for r in rows)
    cells = [r.cell for r in rows]
    assert len(set(cells)) == len(cells)
    rows2 = train_centroids(e).collect()
    assert sorted((r.cell, tuple(r.centroid)) for r in rows) == sorted(
        (r.cell, tuple(r.centroid)) for r in rows2
    )


def test_assemble_means_renests_exactly(spark):
    """r16 optimization: the train loop collects (cell, dim, m) rows and
    re-nests on the driver. _assemble_means must reproduce the old
    array_sort(collect_list(struct(dim, m))) semantics exactly: dim order
    within a cell, independent of collect order."""
    from hbase_observer_es_spark.operators.similarity import _assemble_means

    rows = [
        {"cell": 1, "dim": 2, "m": 0.3},
        {"cell": 0, "dim": 1, "m": -2.5},
        {"cell": 1, "dim": 0, "m": 1.25},
        {"cell": 0, "dim": 0, "m": 7.0},
        {"cell": 1, "dim": 1, "m": 0.5},
    ]
    out = _assemble_means(rows)
    assert out == [(0, [7.0, -2.5]), (1, [1.25, 0.5, 0.3])]
    # shuffled input, same result (collect order is partition-dependent)
    assert _assemble_means(rows[::-1]) == out


def test_trained_ivf_reads_no_label(spark):
    """The trained-IVF path must work on UNLABELED corpora: every parquet scan
    in its physical plan prunes to (vec_id, embedding) — the label column is
    never read."""
    import re

    from hbase_observer_es_spark.operators.similarity import q_sim_ivf_trained
    from hbase_observer_es_spark.plans.inspect import plan_string

    plan = plan_string(q_sim_ivf_trained(spark, SF_ORACLE))
    scans = [
        m.group(1) for m in re.finditer(r"FileScan parquet [^\[]*\[([^\]]*)\]", plan)
    ]
    assert scans and all("label" not in s for s in scans), scans
