"""Property tests for the CDC operators (SURVEY.md §5.4): replay idempotence,
tombstone-wins ordering, pivot last-writer-wins, partial-document merge."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hbase_observer_es_spark.operators.cdc import (
    apply_tombstones,
    latest_cell_state,
    merge_documents,
    pivot_cells,
)

SCHEMA = "row_key string, qualifier string, value string, op string, ts timestamp"


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _mut(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_replay_idempotence(spark):
    """Applying the same mutation log twice must equal applying it once —
    the exactly-once guarantee the reference lacks (at-least-once retry,
    ElasticsearchBulkOperator.java:124-135 in /root/reference)."""
    rows = [
        ("k1", "a", "1", "upsert", _t(1)),
        ("k1", "a", "2", "upsert", _t(2)),
        ("k2", "b", "9", "upsert", _t(3)),
        ("k2", "b", None, "delete", _t(4)),
    ]
    once = _mut(spark, rows)
    twice = once.unionByName(once)
    assert _sorted(apply_tombstones(once)) == _sorted(apply_tombstones(twice))
    assert _sorted(latest_cell_state(once)) == _sorted(latest_cell_state(twice))


def test_tombstone_wins_and_resurrection(spark):
    """A delete kills every older qualifier of the key (whole-doc delete,
    HbaseDataSyncEsObserver.java:101-104); a newer upsert re-creates the doc."""
    rows = [
        ("k1", "a", "old", "upsert", _t(1)),
        ("k1", "b", "old", "upsert", _t(2)),
        ("k1", None, None, "delete", _t(3)),
        ("k1", "a", "new", "upsert", _t(4)),
        ("k2", "a", "kept", "upsert", _t(1)),
    ]
    got = _sorted(apply_tombstones(_mut(spark, rows)))
    assert got == [
        ("k1", "a", "new", _t(4)),
        ("k2", "a", "kept", _t(1)),
    ]


def test_delete_only_key_absent(spark):
    rows = [
        ("k1", "a", "x", "upsert", _t(1)),
        ("k1", None, None, "delete", _t(2)),
    ]
    assert apply_tombstones(_mut(spark, rows)).count() == 0


def test_pivot_last_writer_wins(spark):
    """Qualifier collision: the later write wins — the deterministic version of the
    reference's family-iteration-order overwrite (HbaseDataSyncEsObserver.java:76)."""
    rows = [
        ("k1", "click", "1", "upsert", _t(1)),
        ("k1", "click", "2", "upsert", _t(5)),
        ("k1", "view", "7", "upsert", _t(2)),
    ]
    got = {r["row_key"]: r for r in pivot_cells(_mut(spark, rows)).collect()}
    assert got["k1"]["click"] == "2"
    assert got["k1"]["view"] == "7"
    assert got["k1"]["signup"] is None


def test_partial_document_merge(spark):
    """A7 setDocAsUpsert: a Put carrying only some qualifiers merges into the
    existing doc rather than replacing it (HbaseDataSyncEsObserver.java:85-89)."""
    rows = [
        ("k1", "a", "1", "upsert", _t(1)),
        ("k1", "b", "2", "upsert", _t(2)),  # partial write: only qualifier b
        ("k1", "a", "3", "upsert", _t(3)),  # partial write: only qualifier a
    ]
    docs = {r["row_key"]: r for r in merge_documents(_mut(spark, rows)).collect()}
    assert docs["k1"]["doc"] == "a=3,b=2"
    assert docs["k1"]["n_fields"] == 2


def test_out_of_order_arrival(spark):
    """LWW keyed on ts, not arrival order — deliberately stronger than the
    reference, which drops cell timestamps (SURVEY.md §1.2)."""
    rows = [
        ("k1", "a", "late-written-but-older", "upsert", _t(5)),
        ("k1", "a", "newest", "upsert", _t(9)),
        ("k1", "a", "oldest", "upsert", _t(1)),
    ]
    got = latest_cell_state(_mut(spark, rows)).collect()
    assert len(got) == 1 and got[0]["value"] == "newest"
