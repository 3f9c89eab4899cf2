"""Remaining ES 6.3 query-surface pieces: suggesters, terms lookup, ranges.

The reference's ES 6.3 target (/root/reference/pom.xml:35-46) ships four more
API pieces the registry lacked after round 8's parent-child/rescore work:

* the **term suggester** (`suggest.term`) — spell-correction: each input term
  is expanded against the index's term DICTIONARY by edit distance and the
  candidates are ranked by document frequency (ES sort=frequency mode);
* the **phrase suggester** (`suggest.phrase`) — did-you-mean over multi-word
  input: per-position candidates recombined into phrases, pruned to phrases
  the corpus actually contains (`collate`), ranked by bigram frequency;
* the **terms lookup** mechanism (`terms` query with `index`/`id`/`path`) —
  filter documents by a term set stored in ANOTHER document, ES's poor-man's
  join: fetch the lookup doc once, use its field values as the filter set;
* the **range field type** + range query `relation` semantics
  (intersects/within/contains) — ES 6.x matches stored ranges against a
  query range by interval relation, not point membership.

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
    doc fetched once and broadcast, the lookup doc itself excluded.

    Fixture note: the word-soup corpus draws from a ~31-word shared
    vocabulary, so the >=1-shared-term hit set is near-total here (499/500 at
    sf0.01) — that is the corpus, not the operator; ES terms-lookup IS a
    >=1-membership filter. The ``n_shared`` column carries the
    discrimination, and the semantics pin
    (tests/test_round8_surface.py::test_terms_lookup_counts_shared_distinct_terms)
    checks the exact intersection size per document."""
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


# phrase suggester: a two-word probe one PLAIN-levenshtein edit from fixture
# vocabulary — "tablw" resolves to "table"; "ag" has TWO dictionary
# neighbors ("agg", "a"), so the candidate-phrase ranking is exercised
PHRASE_PROBE = ("tablw", "ag")
PHRASE_SIZE = 3

# range-field relation query: each order's [orderdate, orderdate+30d) active
# period vs a fixed query range, ES relation semantics
RANGE_DAYS = 30
RANGE_Q_FROM = "1996-01-01"
RANGE_Q_TO = "1996-03-01"


def q_search_suggest_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester (did-you-mean), deterministic simplified model:
    per-position candidates by edit distance ≤ 1 against the dictionary,
    candidate PHRASES kept only if the corrected bigram actually occurs in
    the corpus (the `collate` prune), ranked by bigram frequency DESC then
    phrase ASC, top-3. ES's Laplace-smoothed language model is replaced by
    the raw bigram count — same ordering on observed bigrams, integer-exact
    cross-engine (D10 rule: no log-probabilities).

    Scale: the bigram table is one map-side-combined shuffle over the corpus
    (bounded by observed bigrams); per-position candidate sets are
    edit-distance-1 neighborhoods (vocabulary-sparse), their cross product is
    tiny and BROADCAST onto the bigram table — the corpus is never rescanned
    per candidate."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(_toks().alias("tk")).filter(F.size("tk") >= 2)
    tk = F.col("tk")
    bg = F.zip_with(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bigrams = (
        toks.select(F.explode(bg).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = (
        d.select(F.explode(F.array_distinct(_toks())).alias("t")).distinct()
    )
    c1 = vocab.filter(
        F.levenshtein(F.col("t"), F.lit(PHRASE_PROBE[0])) <= SUGGEST_MAX_EDITS
    ).select(F.col("t").alias("w1"))
    c2 = vocab.filter(
        F.levenshtein(F.col("t"), F.lit(PHRASE_PROBE[1])) <= SUGGEST_MAX_EDITS
    ).select(F.col("t").alias("w2"))
    phrases = c1.crossJoin(c2).select(
        F.concat(F.col("w1"), F.lit(" "), F.col("w2")).alias("suggestion")
    )
    w = Window.orderBy(F.desc("freq"), F.asc("suggestion"))
    return (
        bigrams.join(F.broadcast(phrases), bigrams.bigram == phrases.suggestion)
        .select("suggestion", "freq")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PHRASE_SIZE)
    )


SQL_SEARCH_SUGGEST_PHRASE = f"""
WITH d AS (
    SELECT list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
),
bg AS (
    SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
                                 i -> tk[i] || ' ' || tk[i + 1])) AS bigram
    FROM d WHERE len(tk) >= 2
),
bigrams AS (SELECT bigram, COUNT(*) AS freq FROM bg GROUP BY bigram),
vocab AS (SELECT DISTINCT unnest(tk) AS t FROM d),
c1 AS (SELECT t AS w1 FROM vocab WHERE levenshtein(t, '{PHRASE_PROBE[0]}') <= {SUGGEST_MAX_EDITS}),
c2 AS (SELECT t AS w2 FROM vocab WHERE levenshtein(t, '{PHRASE_PROBE[1]}') <= {SUGGEST_MAX_EDITS}),
phrases AS (SELECT w1 || ' ' || w2 AS suggestion FROM c1, c2),
ranked AS (
    SELECT p.suggestion, b.freq,
           row_number() OVER (ORDER BY b.freq DESC, p.suggestion ASC) AS rank
    FROM bigrams b JOIN phrases p ON b.bigram = p.suggestion
)
SELECT suggestion, freq, rank FROM ranked WHERE rank <= {PHRASE_SIZE}
"""


def q_search_range_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 6.x range FIELD type + range query `relation` semantics: each order
    carries a derived date_range [orderdate, orderdate+30d) (the range-field
    analogue — the fixture has no stored range column, same derivation
    pattern as the nested view, D13) and the query range
    [{RANGE_Q_FROM}, {RANGE_Q_TO}) matches with relation=INTERSECTS, with the
    WITHIN and CONTAINS relations emitted as audit flags per hit.

    Map-only: the relation predicates are pure date comparisons pushed onto
    the scan; no join, no shuffle."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("r_from")
    )
    o = o.withColumn("r_to", F.date_add(F.col("r_from"), RANGE_DAYS))
    qf, qt = F.lit(RANGE_Q_FROM).cast("date"), F.lit(RANGE_Q_TO).cast("date")
    intersects = (F.col("r_from") < qt) & (F.col("r_to") > qf)
    within = (F.col("r_from") >= qf) & (F.col("r_to") <= qt)
    contains = (F.col("r_from") <= qf) & (F.col("r_to") >= qt)
    return o.filter(intersects).select(
        "o_orderkey",
        "r_from",
        "r_to",
        within.alias("is_within"),
        contains.alias("is_contains"),
    )


SQL_SEARCH_RANGE_RELATION = f"""
WITH r AS (
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS r_from,
           CAST(o_orderdate AS DATE) + {RANGE_DAYS} AS r_to
    FROM orders
)
SELECT o_orderkey, r_from, r_to,
       (r_from >= DATE '{RANGE_Q_FROM}' AND r_to <= DATE '{RANGE_Q_TO}') AS is_within,
       (r_from <= DATE '{RANGE_Q_FROM}' AND r_to >= DATE '{RANGE_Q_TO}') AS is_contains
FROM r
WHERE r_from < DATE '{RANGE_Q_TO}' AND r_to > DATE '{RANGE_Q_FROM}'
"""


QUERIES = {
    "q_search_suggest_term": q_search_suggest_term,
    "q_search_terms_lookup": q_search_terms_lookup,
    "q_search_suggest_phrase": q_search_suggest_phrase,
    "q_search_range_relation": q_search_range_relation,
}

ORACLES = {
    "q_search_suggest_term": SQL_SEARCH_SUGGEST_TERM,
    "q_search_terms_lookup": SQL_SEARCH_TERMS_LOOKUP,
    "q_search_suggest_phrase": SQL_SEARCH_SUGGEST_PHRASE,
    "q_search_range_relation": SQL_SEARCH_RANGE_RELATION,
}
