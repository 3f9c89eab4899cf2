"""Compound-query surface: dis_max, boosting, pinned, multi_match — the ES
query-DSL combinators that merge several sub-query scores into one ranking.

The reference delegates all querying to Elasticsearch (/root/reference
README.md:3; ES dependency pom.xml:35-46), so the ES query DSL is the
behavioral contract (SURVEY.md §2-B). search.py owns the leaf queries and
search_score.py the result-shaping layer; this module owns score COMBINATION:

* `dis_max`     — q_search_dismax     (max of sub-scores + tie_breaker)
* `boosting`    — q_search_boosting   (demote, don't exclude, negative matches)
* `pinned`      — q_search_pinned     (curated ids first, organic after)
* `multi_match` — q_search_multimatch (best_fields across two fields = dis_max
                  over per-field scores)

Determinism (the search.py rule): sub-scores are rational term-frequency
forms; every combinator is +/·/greatest over those — fixed association order
mirrored literally in the SQL twins; doc_id is the unique tiebreak everywhere.

Scale: all four are map-only column math over one scan — the sub-queries
share the single tokenization, so N sub-queries never mean N passes — with a
TakeOrdered top-k (per-partition heap + driver merge). No join, no window, no
shuffle before the final k rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

DM_TERMS = ("vector", "merge")
DM_TIE = 0.3  # ES dis_max tie_breaker

BOOST_POS = "vector"
BOOST_NEG = "slow"
NEG_BOOST = 0.2  # ES boosting negative_boost

PINNED_IDS = (5, 17, 23)  # ES pinned query `ids`, in curated order
PIN_TERM = "stream"

MM_TERM_TEXT = "vector"
MM_SOURCE = "src3"
MM_SOURCE_BOOST = 2.5  # per-field boost on the keyword field

TOP_K = 20


def _toks() -> Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def _tf(term: str) -> Column:
    return F.size(F.filter(_toks(), lambda t: t == F.lit(term))).cast("double")


_SQL_TF = (
    "CAST(len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),"
    " t -> t = '{term}')) AS DOUBLE)"
)


def q_search_dismax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `dis_max` over two term queries: score = max(s1, s2) +
    tie_breaker · (s1 + s2 − max) — the best-field ranking that avoids
    bool-should's score inflation, top-20.

    Sub-scores are the raw term frequencies (rational; the corpus-stat BM25
    plumbing lives in q_search_bm25 — combination semantics are the point
    here). greatest() and the tie_breaker arithmetic are exact IEEE ops in a
    fixed order. Both tfs come off ONE tokenization of one scan.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", _tf(DM_TERMS[0]).alias("s1"), _tf(DM_TERMS[1]).alias("s2")
    )
    mx = F.greatest(F.col("s1"), F.col("s2"))
    score = mx + F.lit(DM_TIE) * (F.col("s1") + F.col("s2") - mx)
    return (
        d.select("doc_id", "s1", "s2", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


SQL_SEARCH_DISMAX = f"""
WITH s AS (
    SELECT doc_id,
           {_SQL_TF.format(term=DM_TERMS[0])} AS s1,
           {_SQL_TF.format(term=DM_TERMS[1])} AS s2
    FROM documents
)
SELECT doc_id, s1, s2,
       greatest(s1, s2) + {DM_TIE} * (s1 + s2 - greatest(s1, s2)) AS score
FROM s
WHERE greatest(s1, s2) + {DM_TIE} * (s1 + s2 - greatest(s1, s2)) > 0
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


def q_search_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `boosting` query: documents matching the positive term ranked by
    its frequency, DEMOTED (× negative_boost={NEG_BOOST}) — not excluded —
    when the negative term also matches. Top-20.

    The one-conditional-multiply form: score = tf_pos · (neg_boost if
    tf_neg > 0 else 1). The demoted docs stay in the result set with their
    relative order preserved — the property that distinguishes boosting from
    bool.must_not.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        _tf(BOOST_POS).alias("pos_tf"),
        _tf(BOOST_NEG).alias("neg_tf"),
    )
    score = F.col("pos_tf") * F.when(
        F.col("neg_tf") > 0, F.lit(NEG_BOOST)
    ).otherwise(F.lit(1.0))
    return (
        d.filter(F.col("pos_tf") > 0)
        .select(
            "doc_id",
            F.col("pos_tf"),
            (F.col("neg_tf") > 0).alias("demoted"),
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


SQL_SEARCH_BOOSTING = f"""
WITH s AS (
    SELECT doc_id,
           {_SQL_TF.format(term=BOOST_POS)} AS pos_tf,
           {_SQL_TF.format(term=BOOST_NEG)} AS neg_tf
    FROM documents
)
SELECT doc_id, pos_tf, neg_tf > 0 AS demoted,
       pos_tf * (CASE WHEN neg_tf > 0 THEN {NEG_BOOST} ELSE 1.0 END) AS score
FROM s
WHERE pos_tf > 0
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


def q_search_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `pinned` query: curated document ids surface first IN THEIR CURATED
    ORDER, organic matches (by term score) fill the remainder — the editorial
    override every search product ships. Top-10.

    pin_pos is a literal when-chain (position in the pinned list, NULL for
    organic); ranking sorts by (pinned first, pin_pos, score desc, doc_id).
    Pinned docs appear even when they don't match the organic query — ES
    semantics — hence the filter admits either. Map-only + TakeOrdered.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", _tf(PIN_TERM).alias("tf")
    )
    pin_pos: Column = F.lit(None).cast("int")
    for i in range(len(PINNED_IDS) - 1, -1, -1):
        pin_pos = F.when(
            F.col("doc_id") == PINNED_IDS[i], F.lit(i)
        ).otherwise(pin_pos)
    out = d.select(
        "doc_id",
        "tf",
        pin_pos.alias("pin_pos"),
    ).filter(F.col("pin_pos").isNotNull() | (F.col("tf") > 0))
    return (
        out.orderBy(
            F.col("pin_pos").isNull().asc(),  # pinned block first
            F.asc_nulls_last("pin_pos"),
            F.desc("tf"),
            F.asc("doc_id"),
        )
        .limit(10)
    )


_SQL_PIN_CASE = (
    "CASE "
    + " ".join(
        f"WHEN doc_id = {pid} THEN {i}" for i, pid in enumerate(PINNED_IDS)
    )
    + " ELSE NULL END"
)

SQL_SEARCH_PINNED = f"""
WITH s AS (
    SELECT doc_id,
           {_SQL_TF.format(term=PIN_TERM)} AS tf,
           {_SQL_PIN_CASE} AS pin_pos
    FROM documents
)
SELECT doc_id, tf, CAST(pin_pos AS INTEGER) AS pin_pos
FROM s
WHERE pin_pos IS NOT NULL OR tf > 0
ORDER BY (pin_pos IS NULL) ASC, pin_pos ASC NULLS LAST, tf DESC, doc_id ASC
LIMIT 10
"""


def q_search_multimatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `multi_match` type=best_fields across a text field and a boosted
    keyword field: score = dis_max over (tf on text, boost·exact-match on
    source) — "find 'vector' in the body OR documents from src3, best field
    wins". Top-20.

    best_fields IS dis_max (tie_breaker=0) over per-field sub-scores — ES
    documents the equivalence; the keyword sub-score is the boost when source
    matches exactly (term-level semantics on a keyword field), 0 otherwise.
    One scan, both fields read in the same projection.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        _tf(MM_TERM_TEXT).alias("text_score"),
        F.when(F.col("source") == MM_SOURCE, F.lit(MM_SOURCE_BOOST))
        .otherwise(F.lit(0.0))
        .alias("source_score"),
    )
    score = F.greatest(F.col("text_score"), F.col("source_score"))
    return (
        d.select("doc_id", "source", "text_score", "source_score", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


SQL_SEARCH_MULTIMATCH = f"""
WITH s AS (
    SELECT doc_id, source,
           {_SQL_TF.format(term=MM_TERM_TEXT)} AS text_score,
           CAST(CASE WHEN source = '{MM_SOURCE}' THEN {MM_SOURCE_BOOST}
                     ELSE 0.0 END AS DOUBLE) AS source_score
    FROM documents
)
SELECT doc_id, source, text_score, source_score,
       greatest(text_score, source_score) AS score
FROM s
WHERE greatest(text_score, source_score) > 0
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


QUERIES = {
    "q_search_dismax": q_search_dismax,
    "q_search_boosting": q_search_boosting,
    "q_search_pinned": q_search_pinned,
    "q_search_multimatch": q_search_multimatch,
}

ORACLES = {
    "q_search_dismax": SQL_SEARCH_DISMAX,
    "q_search_boosting": SQL_SEARCH_BOOSTING,
    "q_search_pinned": SQL_SEARCH_PINNED,
    "q_search_multimatch": SQL_SEARCH_MULTIMATCH,
}
