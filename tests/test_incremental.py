"""Incremental-ingestion tests: DuckDB-oracle parity for the twin, the
bloom-path-equals-exact-path pin (including under a deliberately saturated
filter), generation-union semantics, and the NULL-text fail-loud rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_observer_es_spark.io import table
from hbase_observer_es_spark.operators.incremental import (
    SQL_INCREMENTAL_UNSEEN,
    q_incremental_unseen,
    snapshot_hashes,
    unseen_docs,
)
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_con


def test_twin_matches_oracle(spark):
    con = duckdb_con(SF_ORACLE)
    try:
        r = compare(
            "q_incremental_unseen",
            q_incremental_unseen(spark, SF_ORACLE),
            con,
            SQL_INCREMENTAL_UNSEEN,
        )
        assert r.ok, r.detail
    finally:
        con.close()


def test_overlap_is_real_on_fixture(spark):
    # the re-crawl batch contains the prior generation's content verbatim,
    # so the filter must drop it (else the twin is a pass-through)
    d = table(spark, SF_ORACLE, "documents")
    n_all = d.count()
    n_prior = d.where(F.col("doc_id") % 3 == 0).count()
    out = q_incremental_unseen(spark, SF_ORACLE)
    # every prior-generation text is re-fetched and dropped; anything ELSE
    # dropped would mean cross-doc duplicate texts (none in this fixture)
    assert out.count() == n_all - n_prior


def test_bloom_path_equals_exact_path(spark):
    d = table(spark, SF_ORACLE, "documents")
    prior = snapshot_hashes(d.where(F.col("doc_id") % 3 == 0))
    batch = d  # the re-crawl
    exact = sorted(
        r["doc_id"] for r in unseen_docs(batch, prior, use_bloom=False).collect()
    )
    via_bloom = sorted(
        r["doc_id"] for r in unseen_docs(batch, prior).collect()
    )
    assert via_bloom == exact
    # a deliberately SATURATED 64-bit filter (every probe says "maybe")
    # still agrees: all rows pay the exact join, FPs die there
    tiny = sorted(
        r["doc_id"]
        for r in unseen_docs(batch, prior, m_bits=64, k=1).collect()
    )
    assert tiny == exact


def test_spill_dir_path_is_equal_and_single_scan(spark, tmp_path):
    d = table(spark, SF_ORACLE, "documents")
    prior = snapshot_hashes(d.where(F.col("doc_id") % 3 == 0))
    # the batch gets its OWN source so the scan-count claim is attributable
    # (the seen set legitimately reads its source for the anti-join side)
    batch_path = str(tmp_path / "batch.parquet")
    d.write.parquet(batch_path)
    batch = spark.read.parquet(batch_path)
    exact = sorted(
        r["doc_id"]
        for r in unseen_docs(batch, prior, use_bloom=False).collect()
    )
    spill = str(tmp_path / "flagged.parquet")
    spilled = unseen_docs(batch, prior, spill_dir=spill)
    assert sorted(r["doc_id"] for r in spilled.collect()) == exact
    # the tee reads the landed copy: the BATCH source never feeds the
    # result plan again — only the spill (and the seen set's own source)
    files = spilled.inputFiles()
    assert any("flagged.parquet" in f for f in files), files
    assert not any("batch.parquet" in f for f in files), files


def test_generations_union(spark):
    g1 = spark.createDataFrame([("a",), ("b",)], "text string")
    g2 = spark.createDataFrame([("b",), ("c",)], "text string")
    seen = snapshot_hashes(g1).union(snapshot_hashes(g2))
    batch = spark.createDataFrame(
        [(1, "a"), (2, "c"), (3, "d")], "doc_id long, text string"
    )
    out = unseen_docs(batch, seen).collect()
    assert [r["doc_id"] for r in out] == [3]
    assert [c for c in out[0].asDict()] == ["doc_id", "text"]  # __h dropped


def test_null_text_fails_loud(spark):
    bad = spark.createDataFrame([(1, None)], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL 'text'"):
        snapshot_hashes(bad).collect()
    good_seen = snapshot_hashes(
        spark.createDataFrame([("x",)], "text string")
    )
    with pytest.raises(Exception, match="NULL 'text'"):
        unseen_docs(bad, good_seen).collect()


def test_seen_frame_shape_validated(spark):
    batch = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="lacks 'h'"):
        unseen_docs(batch, batch.select("text"))
