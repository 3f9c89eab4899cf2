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
    # Two Generate BARRIERS (explode of a 1-element array), the
    # q_search_querystring lesson taken one level deeper: without them,
    # projection collapse inlines p2's WHOLE expression — token split
    # included — into the per-p1-element lambda, re-tokenizing the document
    # |p1| times per row (profiled 8.7×: 5.7 s → 0.65 s at sf0.1). Barrier 1
    # materializes the token array; barrier 2 materializes both position
    # lists, so the pair loop touches plain columns.
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    s1 = d.select("doc_id", F.explode(F.array(toks)).alias("tk"))
    tk = F.col("tk")
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk), F.lit(1)))
    p1 = F.filter(idx, lambda i: F.try_element_at(tk, i) == SPAN_FIRST)
    p2 = F.filter(idx, lambda i: F.try_element_at(tk, i) == SPAN_SECOND)
    s2 = s1.select(
        "doc_id",
        F.explode(F.array(F.struct(p1.alias("p1"), p2.alias("p2")))).alias("ps"),
    )
    spans = F.flatten(
        F.transform(
            F.col("ps.p1"),
            lambda i: F.filter(
                F.col("ps.p2"), lambda j: (j > i) & (j - i <= F.lit(SPAN_SLOP + 1))
            ),
        )
    )
    # explode + count instead of filter(n_spans > 0): the q_search_phrase
    # move — a filter on the computed column would re-expand `spans` in the
    # Filter node (and drop the zero rows is exactly what the groupBy does).
    return (
        s2.select("doc_id", F.explode(spans).alias("j"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_spans"))
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


IV_GAPS = 2  # ES intervals `max_gaps`: up to 2 intervening positions, any order


def q_search_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `intervals` query (match, ordered=false, max_gaps={IV_GAPS}) over the
    same two terms: the modern span replacement — the terms may appear in
    EITHER order as long as at most max_gaps positions intervene. Emits the
    pair count per document.

    n_pairs counts unordered position pairs: tokens[i]=first, tokens[j]=second,
    i≠j, |j−i| − 1 ≤ max_gaps (two-term interval semantics; ES's k-term
    minimal-interval algorithm reduces to exactly this for two clauses). Same
    barrier discipline and explode+count shape as q_search_span_near.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    s1 = d.select("doc_id", F.explode(F.array(toks)).alias("tk"))
    tk = F.col("tk")
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk), F.lit(1)))
    p1 = F.filter(idx, lambda i: F.try_element_at(tk, i) == SPAN_FIRST)
    p2 = F.filter(idx, lambda i: F.try_element_at(tk, i) == SPAN_SECOND)
    s2 = s1.select(
        "doc_id",
        F.explode(F.array(F.struct(p1.alias("p1"), p2.alias("p2")))).alias("ps"),
    )
    pairs = F.flatten(
        F.transform(
            F.col("ps.p1"),
            lambda i: F.filter(
                F.col("ps.p2"),
                lambda j: (j != i)
                & (F.abs(j - i) - F.lit(1) <= F.lit(IV_GAPS)),
            ),
        )
    )
    return (
        s2.select("doc_id", F.explode(pairs).alias("j"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


SQL_SEARCH_INTERVALS = f"""
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
),
hits AS (
    SELECT doc_id,
           len(flatten(list_transform(p1,
                i -> list_filter(p2,
                     j -> j <> i AND abs(j - i) - 1 <= {IV_GAPS})))) AS n_pairs
    FROM pos
)
SELECT doc_id, CAST(n_pairs AS BIGINT) AS n_pairs
FROM hits WHERE n_pairs > 0
"""


# --- span_or / span_first (round 16) -----------------------------------------

SPAN_FIRST_END = 10  # ES span_first `end`: spans ending within the first 10


def q_search_span_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_or` (clauses=[span_term {SPAN_FIRST!r}, span_term
    {SPAN_SECOND!r}]): the UNION of the clause spans per document — span
    count plus the first/last matching position (the span envelope a
    wrapping span_near/span_first consumes). Single-token spans of
    different terms can never coincide, so the union is the merged
    ascending position list; one tokenization, one Generate barrier
    (the q_search_span_near discipline), map-only integer math."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    s1 = d.select("doc_id", F.explode(F.array(toks)).alias("tk"))
    tk = F.col("tk")
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk), F.lit(1)))
    pu = F.filter(
        idx,
        lambda i: (F.try_element_at(tk, i) == SPAN_FIRST)
        | (F.try_element_at(tk, i) == SPAN_SECOND),
    )
    s2 = s1.select("doc_id", F.explode(F.array(pu)).alias("pu"))
    puc = F.col("pu")
    return (
        s2.select(
            "doc_id",
            F.size(puc).cast("bigint").alias("n_spans"),
            F.try_element_at(puc, F.lit(1)).cast("bigint").alias("first_pos"),
            F.try_element_at(puc, F.size(puc)).cast("bigint").alias("last_pos"),
        )
        .filter(F.col("n_spans") > 0)
    )


SQL_SEARCH_SPAN_OR = f"""
WITH tks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
),
pos AS (
    SELECT doc_id,
           list_filter(generate_series(1, greatest(len(tk), 1)),
                       i -> tk[i] = '{SPAN_FIRST}'
                            OR tk[i] = '{SPAN_SECOND}') AS pu
    FROM tks
)
SELECT doc_id,
       CAST(len(pu) AS BIGINT) AS n_spans,
       CAST(pu[1] AS BIGINT) AS first_pos,
       CAST(pu[len(pu)] AS BIGINT) AS last_pos
FROM pos
WHERE len(pu) > 0
"""


def q_search_span_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_first` (match=span_term {SPAN_FIRST!r},
    end={SPAN_FIRST_END}): the wrapped span must END within the first
    `end` positions — for a single-token span at 1-based position i the
    span end is i, so the condition is i <= end (convention fixed
    identically in both engines). Emits the in-boundary occurrence
    count and the earliest position; same one-barrier map-only shape as
    q_search_span_or."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    s1 = d.select("doc_id", F.explode(F.array(toks)).alias("tk"))
    tk = F.col("tk")
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk), F.lit(1)))
    pf = F.filter(
        idx,
        lambda i: (F.try_element_at(tk, i) == SPAN_FIRST)
        & (i <= F.lit(SPAN_FIRST_END)),
    )
    s2 = s1.select("doc_id", F.explode(F.array(pf)).alias("pf"))
    pfc = F.col("pf")
    return (
        s2.select(
            "doc_id",
            F.size(pfc).cast("bigint").alias("n_first"),
            F.try_element_at(pfc, F.lit(1)).cast("bigint").alias("first_pos"),
        )
        .filter(F.col("n_first") > 0)
    )


SQL_SEARCH_SPAN_FIRST = f"""
WITH tks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
),
pos AS (
    SELECT doc_id,
           list_filter(generate_series(1, greatest(len(tk), 1)),
                       i -> tk[i] = '{SPAN_FIRST}'
                            AND i <= {SPAN_FIRST_END}) AS pf
    FROM tks
)
SELECT doc_id,
       CAST(len(pf) AS BIGINT) AS n_first,
       CAST(pf[1] AS BIGINT) AS first_pos
FROM pos
WHERE len(pf) > 0
"""


QUERIES = {
    "q_search_span_near": q_search_span_near,
    "q_search_intervals": q_search_intervals,
    "q_search_span_or": q_search_span_or,
    "q_search_span_first": q_search_span_first,
}
ORACLES = {
    "q_search_span_near": SQL_SEARCH_SPAN_NEAR,
    "q_search_intervals": SQL_SEARCH_INTERVALS,
    "q_search_span_or": SQL_SEARCH_SPAN_OR,
    "q_search_span_first": SQL_SEARCH_SPAN_FIRST,
}
