"""Span queries: proximity search with token-position arithmetic — ES
`span_near` (and the modern `intervals` query it evolved into).

The reference delegates querying to Elasticsearch (/root/reference
README.md:3; pom.xml:35-46); span queries are the positional layer of that
DSL beyond match_phrase: "these terms within N positions, in order". The
engine reuses search.py's positional discipline — integer index arithmetic
over ONE tokenization, no regex, overlap-exact.

Determinism: pure integer math (positions, differences, counts) — nothing
floating anywhere. The Spark expression and the DuckDB twin are the same
flatten(transform(filter)) shape over the same arrays.

Scale: map-only — scan → per-row array math → filter; no shuffle, no join.
Position lists are per-document and bounded by document length; the pair
enumeration is |p1|·|p2| per document ONLY over the two terms' occurrence
lists (a few entries), never over the token array itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

SPAN_FIRST = "key"
SPAN_SECOND = "value"
SPAN_SLOP = 3  # ES span_near slop: up to 3 intervening positions, in order


def q_search_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_near` (clauses=[{SPAN_FIRST!r}, {SPAN_SECOND!r}],
    slop={SPAN_SLOP}, in_order=true): documents where the second term follows
    the first within slop intervening positions, with the exact span count —
    match_phrase's generalization to non-adjacent proximity.

    n_spans counts ordered position pairs (i, j): tokens[i]=first,
    tokens[j]=second, 0 < j−i ≤ slop+1. Both occurrence lists come off the
    SAME hoisted token array (the q_search_phrase re-split guard: greatest(…,1)
    because sequence(1,0) descends in Spark; try_element_at for ANSI
    out-of-bounds safety on empty docs).
    """
    d = table(spark, sf_dir, "documents")
    dd = d.select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("tk"),
    )
    tk = F.col("tk")
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk), F.lit(1)))
    p1 = F.filter(idx, lambda i: F.try_element_at(tk, i) == SPAN_FIRST)
    p2 = F.filter(idx, lambda i: F.try_element_at(tk, i) == SPAN_SECOND)
    spans = F.flatten(
        F.transform(
            p1,
            lambda i: F.filter(
                p2, lambda j: (j > i) & (j - i <= F.lit(SPAN_SLOP + 1))
            ),
        )
    )
    return (
        dd.select("doc_id", F.size(spans).cast("bigint").alias("n_spans"))
        .filter(F.col("n_spans") > 0)
    )


SQL_SEARCH_SPAN_NEAR = f"""
WITH tks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
),
pos AS (
    SELECT doc_id,
           list_filter(generate_series(1, greatest(len(tk), 1)),
                       i -> tk[i] = '{SPAN_FIRST}') AS p1,
           list_filter(generate_series(1, greatest(len(tk), 1)),
                       i -> tk[i] = '{SPAN_SECOND}') AS p2
    FROM tks
)
SELECT doc_id,
       CAST(len(flatten(list_transform(p1,
            i -> list_filter(p2, j -> j > i AND j - i <= {SPAN_SLOP + 1}))))
           AS BIGINT) AS n_spans
FROM pos
WHERE len(flatten(list_transform(p1,
      i -> list_filter(p2, j -> j > i AND j - i <= {SPAN_SLOP + 1})))) > 0
"""


QUERIES = {"q_search_span_near": q_search_span_near}
ORACLES = {"q_search_span_near": SQL_SEARCH_SPAN_NEAR}
