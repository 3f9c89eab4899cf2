"""Remaining ES 6.3 query-surface pieces: term suggester and terms lookup.

The reference's ES 6.3 target (/root/reference/pom.xml:35-46) ships two more
API pieces the registry lacked after round 8's parent-child/rescore work:

* the **term suggester** (`suggest.term`) — spell-correction: each input term
  is expanded against the index's term DICTIONARY by edit distance and the
  candidates are ranked by document frequency (ES sort=frequency mode);
* the **terms lookup** mechanism (`terms` query with `index`/`id`/`path`) —
  filter documents by a term set stored in ANOTHER document, ES's poor-man's
  join: fetch the lookup doc once, use its field values as the filter set.

Scale posture:

* ``q_search_suggest_term`` — the edit distance runs |probes| × |vocabulary|
  times against the aggregated dictionary (one map-side-combined groupBy of
  the corpus tokens), NEVER against corpus token instances — the same
  dictionary-then-postings order as ES and q_search_fuzzy. Probes are a
  3-row broadcast literal; per-probe ranking is a window over the candidate
  set (≤ a few rows per probe at any corpus size, because edit-distance-1
  neighborhoods of a term are vocabulary-sparse).
* ``q_search_terms_lookup`` — the lookup document's distinct terms are a
  document-sized frame (the ES lookup GET), broadcast onto the exploded
  corpus tokens; the per-doc shared-term count is one map-side-combined
  shuffle on doc_id. The corpus is scanned once; nothing sort-merges.

Determinism: levenshtein is integer DP (bit-identical across engines — the
q_search_fuzzy precedent); counts are integers; ranking ties break on the
suggestion string itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from .search import _toks

# term suggester inputs: misspelled probes one edit away from fixture
# vocabulary ("merge", "stream", "vector"), ES suggest.term semantics
SUGGEST_PROBES = ("mergw", "strean", "vectr")
SUGGEST_MAX_EDITS = 1
SUGGEST_SIZE = 3  # ES `size`: suggestions per probe

# terms lookup: the document whose token set becomes the filter
LOOKUP_DOC_ID = 42


def q_search_suggest_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term suggester (sort=frequency): per misspelled probe, the top-3
    dictionary terms within edit distance 1, ranked by document frequency
    DESC then term ASC."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(_toks())).alias("t"))
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("freq"))
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in SUGGEST_PROBES])).alias("probe")
    )
    cand = vocab.crossJoin(F.broadcast(probes)).filter(
        F.levenshtein(F.col("t"), F.col("probe")) <= SUGGEST_MAX_EDITS
    )
    w = Window.partitionBy("probe").orderBy(F.desc("freq"), F.asc("t"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SUGGEST_SIZE)
        .select("probe", F.col("t").alias("suggestion"), "freq", "rank")
    )


SQL_SEARCH_SUGGEST_TERM = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS t
    FROM documents
),
vocab AS (SELECT t, COUNT(*) AS freq FROM toks GROUP BY t),
probes AS (
    SELECT unnest(ARRAY[{", ".join(f"'{p}'" for p in SUGGEST_PROBES)}]) AS probe
),
cand AS (
    SELECT p.probe, v.t, v.freq,
           row_number() OVER (PARTITION BY p.probe ORDER BY v.freq DESC, v.t ASC) AS rank
    FROM vocab v, probes p
    WHERE levenshtein(v.t, p.probe) <= {SUGGEST_MAX_EDITS}
)
SELECT probe, t AS suggestion, freq, rank
FROM cand
WHERE rank <= {SUGGEST_SIZE}
"""


def q_search_terms_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `terms` lookup: documents sharing at least one term with the lookup
    document's token set, with the distinct shared-term count — the lookup
    doc fetched once and broadcast, the lookup doc itself excluded."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.array_distinct(_toks())).alias("t"))
    lookup = (
        tok.filter(F.col("doc_id") == LOOKUP_DOC_ID).select("t").distinct()
    )
    return (
        tok.filter(F.col("doc_id") != LOOKUP_DOC_ID)
        .join(F.broadcast(lookup), "t")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


SQL_SEARCH_TERMS_LOOKUP = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS t
    FROM documents
),
lu AS (SELECT DISTINCT t FROM toks WHERE doc_id = {LOOKUP_DOC_ID})
SELECT p.doc_id, COUNT(*) AS n_shared
FROM toks p JOIN lu USING (t)
WHERE p.doc_id <> {LOOKUP_DOC_ID}
GROUP BY p.doc_id
"""


QUERIES = {
    "q_search_suggest_term": q_search_suggest_term,
    "q_search_terms_lookup": q_search_terms_lookup,
}

ORACLES = {
    "q_search_suggest_term": SQL_SEARCH_SUGGEST_TERM,
    "q_search_terms_lookup": SQL_SEARCH_TERMS_LOOKUP,
}
