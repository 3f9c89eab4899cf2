"""Elasticsearch ``_bulk`` wire-format sink — the reference's actual output
endpoint, emitted as NDJSON request bodies (no ES server required to verify).

The reference ships every HBase mutation to Elasticsearch as a bulk action:
``postPut`` builds one ``update`` with the Put's qualifier→value map as the
partial doc and ``doc_as_upsert=true`` (HbaseDataSyncEsObserver.java:85-87 in
/root/reference), ``postDelete`` one ``delete`` by row key (:102), and
ElasticsearchBulkOperator buffers at most ``MAX_BULK_COUNT=10000`` actions per
bulk request (ElasticsearchBulkOperator.java:41) with a 10 s timed flush
(:29-30). This module produces byte-exact REST ``_bulk`` NDJSON for the same
actions, so the one thing this sandbox cannot run — the HTTP POST — is the only
thing left out; everything up to the request body is real and golden-tested:

    {"update":{"_index":IDX,"_id":ROW_KEY}}
    {"doc":{QUALIFIER:VALUE,...},"doc_as_upsert":true}
    {"delete":{"_index":IDX,"_id":ROW_KEY}}

(The legacy ``_type`` the reference still sets was removed in ES 8; the modern
body omits it. JSON is built entirely JVM-side with ``to_json`` — correct string
escaping for free, no Python in the path.)

Action granularity mirrors the coprocessor: one ``update`` per Put — here one
per ``(row_key, ts)`` group of mutation cells, since a multi-cell Put lands as
one RPC with one timestamp — and one ``delete`` per delete mutation. Doc keys
are emitted qualifier-sorted and same-``(row_key, ts, qualifier)`` collisions
resolve to MAX(value): ``collect_list`` order is partition-dependent, and a
nondeterministic request body can neither be golden-tested nor safely replayed.

Ordering: within one bulk request ES applies actions in order; ACROSS requests
there is no guarantee — true for the reference too (a key's mutations can
straddle two timed flushes). The writer therefore hash-partitions actions by
``row_key`` and sorts each partition by ``(row_key, ts)``: a key's actions
appear ts-ordered within a file, and a partition only splits across files at
the 10 000-action cap (the reference's exact exposure).

Scale: one shuffle for the per-Put grouping (map-side combined), one exchange
for the per-key writer partitioning, ``maxRecordsPerFile`` caps each request
body — no driver-side buffering anywhere, unlike the reference's single locked
heap buffer (ElasticsearchBulkOperator.java:47). At 100 TB the bulk files
shard by key hash; a fleet of independent POST workers drains them with
at-least-once retry per file, which the idempotent ``doc_as_upsert`` actions
tolerate by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BULK_ACTIONS = 10_000  # ElasticsearchBulkOperator.java:41 MAX_BULK_COUNT
DEFAULT_INDEX = "hbase_observer"


def bulk_actions(mut: DataFrame, index: str = DEFAULT_INDEX) -> DataFrame:
    """Mutation-shaped DataFrame (cdc.py contract: row_key, qualifier, value,
    op, ts) → one row per bulk action: ``(row_key, ts, op, action)`` where
    ``action`` is the complete NDJSON payload (two lines for update, one for
    delete, embedded newline included)."""
    meta = lambda verb: F.to_json(  # noqa: E731 - tiny local builder
        F.struct(
            F.struct(
                F.lit(index).alias("_index"), F.col("row_key").alias("_id")
            ).alias(verb)
        )
    )

    upserts = (
        mut.filter(F.col("op") == "upsert")
        # same-cell collisions → deterministic winner first (see docstring)
        .groupBy("row_key", "ts", "qualifier")
        .agg(F.max("value").alias("value"))
        # one Put = one (row_key, ts): cells become the partial doc
        .groupBy("row_key", "ts")
        .agg(
            F.array_sort(F.collect_list(F.struct("qualifier", "value"))).alias("cells")
        )
        .select(
            "row_key",
            "ts",
            F.lit("upsert").alias("op"),
            F.concat(
                meta("update"),
                F.lit("\n"),
                F.to_json(
                    F.struct(
                        F.map_from_entries("cells").alias("doc"),
                        F.lit(True).alias("doc_as_upsert"),
                    )
                ),
            ).alias("action"),
        )
    )

    deletes = mut.filter(F.col("op") == "delete").select(
        "row_key", "ts", F.lit("delete").alias("op"), meta("delete").alias("action")
    )

    return upserts.unionByName(deletes)


def write_bulk(
    actions: DataFrame,
    out_dir: str,
    max_actions: int = MAX_BULK_ACTIONS,
    n_partitions: int | None = None,
) -> None:
    """Write action rows as ``_bulk`` request bodies: text part-files of at most
    ``max_actions`` actions each, key-partitioned and ``(row_key, ts)``-sorted
    (ordering contract in the module docstring). Each output file IS one valid
    ``POST _bulk`` body."""
    parted = (
        actions.repartition(n_partitions, "row_key")
        if n_partitions
        else actions.repartition("row_key")
    )
    (
        # ts ties between an upsert and a delete of the same key order the
        # delete LAST (later action wins in ES) — the same delete-wins-ties
        # rule cdc.apply_tombstones applies, and a deterministic body where a
        # bare (row_key, ts) sort would shuffle the pair arbitrarily.
        parted.sortWithinPartitions("row_key", "ts", F.col("op") == "delete")
        .select("action")
        .write.option("maxRecordsPerFile", max_actions)
        .mode("overwrite")
        .text(out_dir)
    )


class EsBulkSink:
    """Micro-batch ``foreachBatch`` sink: each batch's mutations become one
    directory of bulk request bodies (``base_dir/batch=N/part-*.txt``).

    The streaming twin of the reference's buffer+flush loop: the trigger
    interval IS the 10 s timed flush (A10), ``max_actions`` the 10k cap (A9),
    and checkpoint replay overwrites the batch directory idempotently — with
    ``doc_as_upsert`` actions that is exactly-once delivery to ES, strictly
    stronger than the reference's retry-requeue (ElasticsearchBulkOperator.java:114-137).
    """

    def __init__(
        self,
        base_dir: str,
        index: str = DEFAULT_INDEX,
        max_actions: int = MAX_BULK_ACTIONS,
        n_partitions: int | None = None,
    ):
        self.base_dir = base_dir
        self.index = index
        self.max_actions = max_actions
        self.n_partitions = n_partitions

    def batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.base_dir, f"batch={batch_id}")

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """``foreachBatch`` callable."""
        write_bulk(
            bulk_actions(batch_df, self.index),
            self.batch_dir(batch_id),
            self.max_actions,
            self.n_partitions,
        )
