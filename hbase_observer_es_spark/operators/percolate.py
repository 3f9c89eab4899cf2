"""Percolate — ES's reverse search: documents are matched against a REGISTRY
of stored queries (the alerting/saved-search primitive: "which subscriptions
does this incoming document trigger?").

The reference delegates querying to Elasticsearch (/root/reference
README.md:3; pom.xml:35-46); the percolator is the one ES query type that
inverts the data/query roles, so its Spark-first shape inverts too: the query
registry is the SMALL side (broadcast), the document corpus is the scan.

Query registry semantics implemented (a representative percolator subset):
``and`` (both terms), ``or`` (either term), ``phrase`` (adjacent pair) — the
boolean/positional cores the other search modules own, here evaluated
data-driven from registry ROWS rather than compiled literals.

Determinism: pure boolean/array/int expressions; the audit is integer counts
plus min(doc_id) as the deterministic sample hit.

Scale: ONE pass over the corpus — the registry broadcast-joins onto the scan
(|registry| × rows intermediates, with |registry| a constant), the per-pair
match is codegen'd column math, and the audit groupBy reduces map-side to a
registry-sized frame. Production ES prunes candidate queries with a term
index over the registry before evaluating; at 100 TB with a large registry
the same pruning applies here (explode doc terms ⨝ registry term dictionary
before full evaluation) — the evaluation dataflow below is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import fan_out, table

# (query_id, mode, term_a, term_b) — the stored-query registry
PERCOLATOR_QUERIES = (
    (1, "and", "vector", "merge"),
    (2, "or", "stream", "batch"),
    (3, "phrase", "row", "fast"),
    (4, "and", "key", "value"),
    (5, "phrase", "the", "table"),
)


def q_search_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match every document against the stored-query registry; emit the
    per-query audit (matching docs, first matching doc_id) — the percolator's
    "which alerts fired, on what" report."""
    # fan_out (r17 gate A/B: 0.96 -> 0.76 s median): spread the tokenize+probe
    d = fan_out(table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    # Generate barrier (the query_string/span lesson): tk feeds one
    # array_contains per registry term plus the phrase probe — materialize it
    # once per row, not once per reference.
    docs = d.select("doc_id", F.explode(F.array(toks)).alias("tk"))
    reg = spark.createDataFrame(
        list(PERCOLATOR_QUERIES), "query_id INT, mode STRING, term_a STRING, term_b STRING"
    )
    tk = F.col("tk")
    has_a = F.array_contains(tk, F.col("term_a"))
    has_b = F.array_contains(tk, F.col("term_b"))
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - 1, F.lit(1)))
    adjacent = F.exists(
        idx,
        lambda i: (F.try_element_at(tk, i) == F.col("term_a"))
        & (F.try_element_at(tk, i + 1) == F.col("term_b")),
    )
    match = (
        F.when(F.col("mode") == "and", has_a & has_b)
        .when(F.col("mode") == "or", has_a | has_b)
        .otherwise(adjacent)
    )
    return (
        docs.join(F.broadcast(reg))
        .filter(match)
        .groupBy("query_id", "mode")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


def _sql_registry_values() -> str:
    return ", ".join(
        f"({qid}, '{mode}', '{a}', '{b}')" for qid, mode, a, b in PERCOLATOR_QUERIES
    )


SQL_SEARCH_PERCOLATE = f"""
WITH reg(query_id, mode, term_a, term_b) AS (
    VALUES {_sql_registry_values()}
),
docs AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
),
matched AS (
    SELECT r.query_id, r.mode, d.doc_id
    FROM docs d, reg r
    WHERE CASE
            WHEN r.mode = 'and'
                THEN list_contains(d.tk, r.term_a) AND list_contains(d.tk, r.term_b)
            WHEN r.mode = 'or'
                THEN list_contains(d.tk, r.term_a) OR list_contains(d.tk, r.term_b)
            ELSE len(list_filter(
                     generate_series(1, greatest(len(d.tk) - 1, 1)),
                     i -> d.tk[i] = r.term_a AND d.tk[i + 1] = r.term_b)) > 0
          END
)
SELECT CAST(query_id AS INTEGER) AS query_id, mode,
       COUNT(*) AS n_matches, MIN(doc_id) AS first_doc_id
FROM matched
GROUP BY query_id, mode
"""


QUERIES = {"q_search_percolate": q_search_percolate}
ORACLES = {"q_search_percolate": SQL_SEARCH_PERCOLATE}
