"""Full-text search surface — the capability the reference delegates to Elasticsearch.

The reference syncs HBase rows into ES *so that ES can answer search queries over
them* (/root/reference/README.md:3; ES 6.3 dependency at /root/reference/pom.xml:35-46).
This module owns that delegated surface natively: relevance-scored multi-term match
(ES `match` + top-k), positional phrase match (ES `match_phrase`), and multi-key point
lookup (ES `mget`). SURVEY.md §2-B is the capability tether.

Determinism note (drives the scoring design): the oracle compares doubles by exact
shortest-roundtrip repr, so every float op must be bit-identical between Spark (JVM)
and DuckDB (C). `ln`/`log` are only ~1-ulp accurate in both and NOT guaranteed to
agree, so BM25's usual log-idf is replaced by the rational idf
``(N - df + 0.5) / (df + 0.5)`` — same monotonicity, only IEEE-exact ops
(+ - * /) in a fixed association order mirrored in the SQL.

Scale (100 TB): corpus stats (N, avgdl, per-term df) are one map-side-combined
aggregate producing ONE row, broadcast back onto the scan; scoring is pure
whole-stage-codegen column math; the top-k is a TakeOrdered (per-partition heap +
driver merge of k rows), never a global sort. Point lookup is a pushed-down IN
filter — partition/row-group pruning on a key-sorted layout makes it an index seek.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fan_out, table

# Fixed query: three mid-frequency fixture-vocabulary terms (TESTDATA.md documents).
QUERY_TERMS = ("vector", "merge", "stream")
K1 = 1.2
B = 0.75
TOP_K = 10

PHRASE = ("row", "fast")

MGET_KEYS = (7, 42, 191, 404, 777)


def _toks() -> Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def q_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-scored full-text match (rational idf), top-10 — ES `match` query analogue.

    score(d) = Σ_t idf_t · cnt_t·(k1+1) / (cnt_t + k1·(1−b + b·dl/avgdl))
    with idf_t = (N − df_t + 0.5)/(df_t + 0.5); k1=1.2, b=0.75.
    """
    # fan_out (r17 gate A/B: 1.13 -> 0.78 s median): the per-term counting
    # otherwise runs in the single sub-split scan task
    d = fan_out(table(spark, sf_dir, "documents")).select("doc_id", _toks().alias("tk"))

    def cnt(w: str) -> Column:
        # nested def, not a default-arg lambda: a 2-param lambda would be treated
        # as filter's (element, index) form and shadow the captured term.
        return F.size(F.filter(F.col("tk"), lambda t: t == w))

    cnt_cols = [cnt(w).alias(f"c{i}") for i, w in enumerate(QUERY_TERMS)]
    cnts = d.select("doc_id", F.size(F.col("tk")).alias("dl"), *cnt_cols)
    stats = cnts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
        *[
            F.sum((F.col(f"c{i}") > 0).cast("bigint")).cast("double").alias(f"df{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    scored = cnts.crossJoin(F.broadcast(stats))

    def term_score(i: int) -> Column:
        cnt = F.col(f"c{i}").cast("double")
        dl = F.col("dl").cast("double")
        idf = (F.col("n") - F.col(f"df{i}") + F.lit(0.5)) / (F.col(f"df{i}") + F.lit(0.5))
        denom = cnt + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / F.col("avgdl"))
        return idf * (cnt * F.lit(K1 + 1.0)) / denom

    score = term_score(0) + term_score(1) + term_score(2)
    return (
        scored.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


def _sql_term_score(i: int) -> str:
    return (
        f"((n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (CAST(c{i} AS DOUBLE) * {K1 + 1.0})"
        f" / (CAST(c{i} AS DOUBLE) + {K1} * ({1.0 - B} + {B} * CAST(dl AS DOUBLE) / avgdl))"
    )


def _sql_cnt(w: str) -> str:
    return f"len(list_filter(tk, t -> t = '{w}'))"


SQL_SEARCH_BM25 = f"""
WITH tks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
),
cnts AS (
    SELECT doc_id, len(tk) AS dl,
           {", ".join(f"{_sql_cnt(w)} AS c{i}" for i, w in enumerate(QUERY_TERMS))}
    FROM tks
),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
           {", ".join(
               f"CAST(SUM(CASE WHEN c{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
               for i in range(len(QUERY_TERMS))
           )}
    FROM cnts
)
SELECT doc_id,
       {" + ".join(_sql_term_score(i) for i in range(len(QUERY_TERMS)))} AS score
FROM cnts, stats
WHERE {" + ".join(_sql_term_score(i) for i in range(len(QUERY_TERMS)))} > 0
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


def q_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase match — ES `match_phrase` analogue, overlap-safe.

    Counts token positions i where tokens[i..i+1] equals the phrase — integer
    index arithmetic over the token array (no regex), so adjacent/overlapping
    occurrences count exactly and both engines agree bit-for-bit.
    """
    d = table(spark, sf_dir, "documents")
    w0, w1 = PHRASE
    # hoist the token array into a named column: an expression nested in the
    # index lambda below would re-split the text per index element (see
    # dedup._shingled_docs for the profiled 8× cost of that mistake)
    dd = d.select("doc_id", "lang", _toks().alias("tk"))
    tk = F.col("tk")
    # greatest(...,1) not 0: sequence(1,0) DESCENDS in Spark but is empty in
    # DuckDB; try_element_at makes the one-token-doc probe null-safe (ANSI mode
    # throws on out-of-bounds element_at)
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - 1, F.lit(1)))
    hit_positions = F.filter(
        idx,
        lambda i: (F.try_element_at(tk, i) == w0)
        & (F.try_element_at(tk, i + 1) == w1),
    )
    # explode hits + re-aggregate instead of filter(n_hits > 0): a filter on the
    # computed column would be pushed below the projection and re-expand the
    # whole expression (re-splitting text per index element) in the Filter node
    return (
        dd.select("doc_id", "lang", F.explode(hit_positions).alias("pos"))
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


SQL_SEARCH_PHRASE = f"""
SELECT doc_id, lang, n_hits FROM (
    SELECT doc_id, lang,
           CAST(len(list_filter(
               generate_series(1, greatest(len(tk) - 1, 1)),
               i -> tk[i] = '{PHRASE[0]}' AND tk[i + 1] = '{PHRASE[1]}'
           )) AS BIGINT) AS n_hits
    FROM (SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM documents)
)
WHERE n_hits > 0
"""


# "sart" is within one edit of BOTH "part" and "sort" in the fixture vocabulary —
# the expansion genuinely fans out, as an ES fuzzy query's term enumeration does.
FUZZY_TERM = "sart"
MAX_EDITS = 1


def q_search_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy term match — ES `fuzzy` query analogue (edit distance ≤ 1).

    ES expands a fuzzy term against the index's term dictionary, then runs the
    expanded disjunction. Same two stages here: (1) the token DICTIONARY
    (distinct tokens — vocabulary-sized, tiny next to the corpus) is filtered by
    levenshtein ≤ MAX_EDITS; (2) the surviving variants broadcast-join back
    onto the exploded corpus tokens, grouped per doc. The expensive corpus side
    never computes an edit distance — at 100 TB the distance runs |vocab| times,
    not |tokens| times, exactly like ES's dictionary-then-postings order.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("t"))
    vocab = tok.select("t").distinct()
    expanded = vocab.filter(F.levenshtein(F.col("t"), F.lit(FUZZY_TERM)) <= MAX_EDITS)
    return (
        tok.join(F.broadcast(expanded), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            # comma-joined string, not array<string>: scalar columns keep the
            # result canonicalizer-friendly (arrays are unhashable downstream)
            F.array_join(F.array_sort(F.collect_set("t")), ",").alias("variants"),
        )
    )


SQL_SEARCH_FUZZY = f"""
WITH tok AS (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
    FROM documents
),
expanded AS (
    SELECT t FROM (SELECT DISTINCT t FROM tok)
    WHERE levenshtein(t, '{FUZZY_TERM}') <= {MAX_EDITS}
)
SELECT doc_id,
       COUNT(*) AS n_hits,
       string_agg(DISTINCT t, ',' ORDER BY t) AS variants
FROM tok JOIN expanded USING (t)
GROUP BY doc_id
"""


MLT_DOC_ID = 7
MLT_MAX_QUERY_TERMS = 8  # ES more_like_this max_query_terms: keep the rarest terms
MLT_MIN_DF = 2  # ES min_doc_freq: drop hapax terms (often typos/noise)


def q_search_mlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this — ES `more_like_this` analogue: find the docs most similar
    to a probe document by its most discriminative terms.

    ES's three stages, Spark-native:
    1. term selection: the probe doc's distinct terms ranked by rarity
       (df ASC, term ASC), keeping MLT_MAX_QUERY_TERMS with df ≥ MLT_MIN_DF —
       the `max_query_terms`/`min_doc_freq` controls;
    2. the selected terms (a ≤8-row dim) broadcast-join back onto the corpus
       doc-term pairs — the corpus side is touched once, no per-doc probe scan;
    3. per-doc score = Σ rational idf over shared terms, summed as a sorted
       fold (collect_list → array_sort → aggregate) so the float addition
       order is fixed and bit-identical to the oracle's ordered list_reduce —
       a groupBy SUM over doubles would be partition-order-dependent.

    Scale: df table and stats are vocabulary-/1-row-sized broadcasts; scoring is
    one shuffle on doc_id bounded by docs-containing-selected-terms; top-k is
    TakeOrdered.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(_toks()).alias("tk")
    )
    pairs = d.select("doc_id", F.explode("tk").alias("t"))
    stats = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    dfs = pairs.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    w_rare = Window.orderBy(F.asc("df"), F.asc("t"))  # vocabulary-sized window
    selected = (
        pairs.filter(F.col("doc_id") == MLT_DOC_ID)
        .join(dfs, "t")
        .filter(F.col("df") >= MLT_MIN_DF)
        .withColumn("rn", F.row_number().over(w_rare))
        .filter(F.col("rn") <= MLT_MAX_QUERY_TERMS)
        .select("t", "df")
    )
    idf = (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    matched = (
        pairs.filter(F.col("doc_id") != MLT_DOC_ID)
        .join(F.broadcast(selected), "t")
        .join(F.broadcast(stats))
        .select("doc_id", "t", idf.alias("idf"))
    )
    score = F.aggregate(
        F.array_sort(F.collect_list(F.struct("t", "idf"))),
        F.lit(0.0),
        lambda acc, x: acc + x["idf"],
    )
    return (
        matched.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


SQL_SEARCH_MLT = f"""
WITH d AS (
    SELECT doc_id, list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
    FROM documents
),
pairs AS (SELECT doc_id, unnest(tk) AS t FROM d),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
dfs AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM pairs GROUP BY t),
sel AS (
    SELECT t, df FROM (
        SELECT p.t, f.df,
               row_number() OVER (ORDER BY f.df ASC, p.t ASC) AS rn
        FROM pairs p JOIN dfs f USING (t)
        WHERE p.doc_id = {MLT_DOC_ID} AND f.df >= {MLT_MIN_DF}
    )
    WHERE rn <= {MLT_MAX_QUERY_TERMS}
),
m AS (
    SELECT p.doc_id, p.t, (n - df + 0.5) / (df + 0.5) AS idf
    FROM pairs p JOIN sel USING (t), stats
    WHERE p.doc_id <> {MLT_DOC_ID}
)
SELECT doc_id, COUNT(*) AS n_terms,
       list_reduce(list_prepend(0.0, list(idf ORDER BY t ASC)), (acc, x) -> acc + x) AS score
FROM m
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


SIG_FG_LANG = "de"  # foreground slice: one language vs the whole corpus
SIG_MIN_FG_DF = 3  # ES significant_terms min_doc_count
SIG_TOP_K = 10


def q_search_sigterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Significant terms — ES `significant_terms` aggregation: which terms are
    over-represented in a foreground slice relative to the whole corpus.

    Scoring is ES's JLH heuristic, (fg% − bg%) · (fg% / bg%) — pure +−×/ on
    count-derived doubles in one fixed association order, so scores are
    bit-identical across engines (no log-likelihood, which would hit the
    libm-vs-JVM `ln` drift documented in the module header). min_doc_count
    filters noise terms exactly as ES does.

    Scale: ONE pass over doc-term pairs with a conditional count for the
    foreground — the background df and foreground df come out of the same
    map-side-combined groupBy; corpus totals are a broadcast 1-row aggregate.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.array_distinct(_toks()).alias("tk")
    )
    pairs = d.select("lang", F.explode("tk").alias("t"))
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("bg_n"),
        F.count(F.when(F.col("lang") == SIG_FG_LANG, 1)).cast("double").alias("fg_n"),
    )
    dfs = pairs.groupBy("t").agg(
        F.count(F.lit(1)).alias("bg_df"),
        F.count(F.when(F.col("lang") == SIG_FG_LANG, 1)).alias("fg_df"),
    )
    fg_pct = F.col("fg_df").cast("double") / F.col("fg_n")
    bg_pct = F.col("bg_df").cast("double") / F.col("bg_n")
    score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    return (
        dfs.filter(F.col("fg_df") >= SIG_MIN_FG_DF)
        .join(F.broadcast(stats))
        .select(F.col("t").alias("term"), "fg_df", "bg_df", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(SIG_TOP_K)
    )


SQL_SEARCH_SIGTERMS = f"""
WITH d AS (
    SELECT doc_id, lang,
           list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
    FROM documents
),
pairs AS (SELECT lang, unnest(tk) AS t FROM d),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS bg_n,
           CAST(COUNT(CASE WHEN lang = '{SIG_FG_LANG}' THEN 1 END) AS DOUBLE) AS fg_n
    FROM d
),
dfs AS (
    SELECT t,
           COUNT(*) AS bg_df,
           COUNT(CASE WHEN lang = '{SIG_FG_LANG}' THEN 1 END) AS fg_df
    FROM pairs GROUP BY t
)
SELECT t AS term, fg_df, bg_df,
       ((CAST(fg_df AS DOUBLE) / fg_n) - (CAST(bg_df AS DOUBLE) / bg_n))
       * ((CAST(fg_df AS DOUBLE) / fg_n) / (CAST(bg_df AS DOUBLE) / bg_n)) AS score
FROM dfs, stats
WHERE fg_df >= {SIG_MIN_FG_DF}
ORDER BY score DESC, term ASC
LIMIT {SIG_TOP_K}
"""


SUGGEST_PREFIX = "s"  # matches several fixture-vocabulary terms (scan, spark, …)
SUGGEST_K = 8


def q_search_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix completion — ES `completion` suggester analogue: terms starting
    with the typed prefix, ranked by corpus frequency.

    ES backs this with a dedicated FST index; the Spark-native form is a
    pushable prefix filter over the exploded token stream plus one map-side-
    combined count. The result is vocabulary-bounded (tiny) at any corpus
    size, and on a token-sorted layout the prefix predicate is a range scan —
    the columnar stand-in for the FST walk.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(_toks()).alias("t"))
    return (
        tok.filter(F.col("t").startswith(SUGGEST_PREFIX))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.col("t").alias("suggestion"), "freq")
        .orderBy(F.desc("freq"), F.asc("suggestion"))
        .limit(SUGGEST_K)
    )


SQL_SEARCH_SUGGEST = f"""
SELECT t AS suggestion, COUNT(*) AS freq
FROM (
    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
    FROM documents
)
WHERE t LIKE '{SUGGEST_PREFIX}%'
GROUP BY t
ORDER BY freq DESC, suggestion ASC
LIMIT {SUGGEST_K}
"""


def q_get_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key point lookup — ES `mget` / HBase `Get` analogue.

    A pushed-down IN filter + narrow projection: `.explain` shows the predicate in
    PushedFilters and a 4-column ReadSchema, so a key-sorted/bucketed layout turns
    this into row-group pruning (the columnar stand-in for HBase's rowkey seek,
    HbaseDataSyncEsObserver.java:71 doc-id semantics).
    """
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey").isin(*MGET_KEYS)).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


SQL_GET_BY_KEY = f"""
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_custkey IN ({", ".join(str(k) for k in MGET_KEYS)})
"""


HL_TERM = "data"


def q_search_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-field term highlighting — ES highlight API analogue
    (`number_of_fragments: 0` mode: the full field with every occurrence of the
    matched term wrapped in ``<em>`` tags).

    Two stages, both map-only over the corpus scan:
    * match: token-array membership test (same tokenization as the rest of the
      search module) — cheap filter first, so the regex rewrite below only runs
      on matching docs;
    * highlight: word-boundary regexp_replace wrapping each occurrence. The
      pattern is a literal term + ``\\b`` anchors, which Java regex (Spark) and
      RE2 (DuckDB) treat identically for ASCII text — no engine-divergent
      constructs (no backrefs, no lookaround).

    Scale: embarrassingly parallel — no shuffle at all; the filter prunes
    before the (more expensive) regex runs.
    """
    d = table(spark, sf_dir, "documents")
    hit = F.array_contains(_toks(), HL_TERM)
    n_hits = F.size(F.filter(_toks(), lambda t: t == F.lit(HL_TERM)))
    snippet = F.regexp_replace(
        F.col("text"), rf"\b{HL_TERM}\b", f"<em>{HL_TERM}</em>"
    )
    return d.filter(hit).select(
        "doc_id", n_hits.alias("n_hits"), snippet.alias("snippet")
    )


SQL_SEARCH_HIGHLIGHT = f"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> t = '{HL_TERM}')) AS n_hits,
       regexp_replace(text, '\\b{HL_TERM}\\b', '<em>{HL_TERM}</em>', 'g') AS snippet
FROM documents
WHERE list_contains(list_filter(string_split(text, ' '), t -> t <> ''), '{HL_TERM}')
"""


BOOL_MUST = "vector"
BOOL_SHOULD = ("stream", "fast")
BOOL_MIN_SHOULD = 1
BOOL_MUST_NOT = "dup"


def q_search_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `bool` query: must + should (with minimum_should_match) + must_not,
    composed over token-set membership — the predicate-composition core of the
    ES query DSL the reference delegates to (README.md:3 in /root/reference).

    All three clauses are tests against ONE tokenization of the row, evaluated
    in a single map-only projection — the filter is pure whole-stage-codegen
    column math, no joins, no shuffle; should-match count is kept as output the
    way ES folds should-clauses into the score.
    """
    d = table(spark, sf_dir, "documents")
    tk = _toks()
    must = F.array_contains(tk, BOOL_MUST)
    should_n = sum(
        (F.array_contains(tk, w).cast("int") for w in BOOL_SHOULD), F.lit(0)
    )
    must_not = F.array_contains(tk, BOOL_MUST_NOT)
    return (
        d.select("doc_id", "lang", must.alias("m"), should_n.alias("should_matches"),
                 must_not.alias("mn"))
        .filter(F.col("m") & (F.col("should_matches") >= BOOL_MIN_SHOULD) & ~F.col("mn"))
        .select("doc_id", "lang", "should_matches")
    )


_sql_should = " + ".join(
    f"CAST(list_contains(tk, '{w}') AS INT)" for w in BOOL_SHOULD
)
SQL_SEARCH_BOOL = f"""
WITH t AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS tk
    FROM documents
)
SELECT doc_id, lang, {_sql_should} AS should_matches
FROM t
WHERE list_contains(tk, '{BOOL_MUST}')
  AND ({_sql_should}) >= {BOOL_MIN_SHOULD}
  AND NOT list_contains(tk, '{BOOL_MUST_NOT}')
"""


PREFIX = "s"


def q_search_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `prefix` term query: documents containing any token with the given
    prefix, plus the matched distinct terms (what ES's term expansion finds).

    The prefix test runs inside a higher-order filter over the token array —
    map-only, codegen, no explode (the row never fans out). The matched-term
    list is emitted as a sorted comma-joined STRING: scalar columns only, per
    the driver canonicalizer contract (array columns are unhashable there —
    the q_search_fuzzy round-2 lesson).

    Scale: at 100 TB an unanchored wildcard would need a term dictionary
    (vocabulary-bounded, like q_search_fuzzy's); a PREFIX stays a per-row scan
    predicate and needs nothing global.
    """
    d = table(spark, sf_dir, "documents")
    matched = F.array_sort(
        F.array_distinct(F.filter(_toks(), lambda t: t.startswith(PREFIX)))
    )
    return (
        d.select("doc_id", matched.alias("m"))
        .filter(F.size("m") > 0)
        .select(
            "doc_id",
            F.size("m").cast("bigint").alias("n_terms"),  # match the oracle's BIGINT len()
            F.array_join("m", ",").alias("matched_terms"),
        )
    )


SQL_SEARCH_PREFIX = f"""
WITH m AS (
    SELECT doc_id,
           list_sort(list_distinct(list_filter(string_split(text, ' '),
                     t -> t LIKE '{PREFIX}%'))) AS mt
    FROM documents
)
SELECT doc_id, len(mt) AS n_terms, array_to_string(mt, ',') AS matched_terms
FROM m
WHERE len(mt) > 0
"""


# match_phrase_prefix "order s" — last position expands to every fixture token
# starting with "s" (scan/slow/small/sort/spark/stream): the autocomplete query
PP_FIRST = "order"
PP_PREFIX = "s"


def q_search_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `match_phrase_prefix` — the autocomplete query: a positional phrase
    whose LAST term matches by prefix ("order s" hits "order scan",
    "order sort", ...).

    Same overlap-safe integer position arithmetic as q_search_phrase (exact
    adjacent-occurrence counts, no regex), with the last-position equality
    relaxed to startswith. ES bounds the prefix expansion with
    `max_expansions`; here the expansion never materializes at all — the
    prefix test runs positionally inside the same map-only pass, so there is
    nothing to bound. One scan, no shuffle below the per-doc aggregate.
    """
    d = table(spark, sf_dir, "documents")
    dd = d.select("doc_id", "lang", _toks().alias("tk"))
    tk = F.col("tk")
    # the q_search_phrase guards, same reasons: greatest(...,1) because
    # sequence(1,0) DESCENDS in Spark; try_element_at for ANSI out-of-bounds
    idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - 1, F.lit(1)))
    hit_positions = F.filter(
        idx,
        lambda i: (F.try_element_at(tk, i) == PP_FIRST)
        & F.try_element_at(tk, i + 1).startswith(PP_PREFIX),
    )
    return (
        dd.select("doc_id", "lang", F.explode(hit_positions).alias("pos"))
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


SQL_SEARCH_PHRASE_PREFIX = f"""
SELECT doc_id, lang, n_hits FROM (
    SELECT doc_id, lang,
           CAST(len(list_filter(
               generate_series(1, greatest(len(tk) - 1, 1)),
               i -> tk[i] = '{PP_FIRST}' AND tk[i + 1] LIKE '{PP_PREFIX}%'
           )) AS BIGINT) AS n_hits
    FROM (SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), t -> t <> '') AS tk
          FROM documents)
)
WHERE n_hits > 0
"""


# ES wildcard syntax: `?` = exactly one char, `*` = any run (incl. empty).
# "s?a*" exercises both metachars and expands to several fixture terms
# (scan, small, spark) — the fan-out a term query's expansion really has.
WILDCARD = "s?a*"


def _wildcard_to_regex(pat: str) -> str:
    """Anchored Java/RE2-safe regex from an ES wildcard pattern (metachars
    limited to ?/* exactly as ES's WildcardQuery defines them)."""
    out = []
    for c in pat:
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        else:
            out.append(re.escape(c))
    return "^" + "".join(out) + "$"


def q_search_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `wildcard` term query — the last of SURVEY §2-B's term-level filter
    set (term/range/prefix/wildcard; the reference delegates all four to ES,
    pom.xml:35-46 in /root/reference).

    An unanchored wildcard cannot be a scan predicate at scale — evaluated
    per token it runs |corpus tokens| regex matches. ES instead enumerates
    the term DICTIONARY (a vocabulary-sized structure) against the pattern
    and rewrites the query into the matched-term disjunction. Same two
    stages here, the q_search_fuzzy shape: (1) regex over the distinct-token
    dictionary; (2) the surviving terms broadcast-join back onto the
    exploded corpus tokens, grouped per doc. The corpus side never evaluates
    the pattern — at 100 TB the regex runs |vocab| times, not |tokens| times.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("t"))
    vocab = tok.select("t").distinct()
    expanded = vocab.filter(F.col("t").rlike(_wildcard_to_regex(WILDCARD)))
    return (
        tok.join(F.broadcast(expanded), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.array_join(F.array_sort(F.collect_set("t")), ",").alias("variants"),
        )
    )


# LIKE carries ES wildcard semantics exactly: ? -> _, * -> %
_WILDCARD_LIKE = WILDCARD.replace("*", "%").replace("?", "_")
SQL_SEARCH_WILDCARD = f"""
WITH tok AS (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
    FROM documents
),
expanded AS (
    SELECT t FROM (SELECT DISTINCT t FROM tok)
    WHERE t LIKE '{_WILDCARD_LIKE}'
)
SELECT doc_id,
       COUNT(*) AS n_hits,
       string_agg(DISTINCT t, ',' ORDER BY t) AS variants
FROM tok JOIN expanded USING (t)
GROUP BY doc_id
"""


# Alternation + a character class: the regexp features a term-level ES
# `regexp` query actually exercises. Anchored on both engines (ES regexp
# matches the WHOLE term, unlike `match`): matches exactly {group, window}.
REGEXP_PAT = "(gro|win)[a-z]+"


def q_search_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `regexp` term query: whole-term regex match, dictionary-first.

    Identical plan shape to q_search_wildcard — ES itself implements both as
    term-dictionary automata intersections, differing only in the pattern
    language. The pattern stays in the RE2 ∩ java.util.regex common subset
    (alternation, character classes) so Spark's rlike and DuckDB's
    regexp_full_match agree by construction; anchoring is explicit (^...$)
    on the Spark side and built into regexp_full_match on the oracle side.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("t"))
    vocab = tok.select("t").distinct()
    expanded = vocab.filter(F.col("t").rlike(f"^(?:{REGEXP_PAT})$"))
    return (
        tok.join(F.broadcast(expanded), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.array_join(F.array_sort(F.collect_set("t")), ",").alias("variants"),
        )
    )


SQL_SEARCH_REGEXP = f"""
WITH tok AS (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
    FROM documents
),
expanded AS (
    SELECT t FROM (SELECT DISTINCT t FROM tok)
    WHERE regexp_full_match(t, '{REGEXP_PAT}')
)
SELECT doc_id,
       COUNT(*) AS n_hits,
       string_agg(DISTINCT t, ',' ORDER BY t) AS variants
FROM tok JOIN expanded USING (t)
GROUP BY doc_id
"""


QUERIES = {
    "q_search_bm25": q_search_bm25,
    "q_search_phrase": q_search_phrase,
    "q_search_fuzzy": q_search_fuzzy,
    "q_search_mlt": q_search_mlt,
    "q_search_sigterms": q_search_sigterms,
    "q_search_suggest": q_search_suggest,
    "q_search_highlight": q_search_highlight,
    "q_search_bool": q_search_bool,
    "q_search_prefix": q_search_prefix,
    "q_search_phrase_prefix": q_search_phrase_prefix,
    "q_search_wildcard": q_search_wildcard,
    "q_search_regexp": q_search_regexp,
    "q_get_by_key": q_get_by_key,
}

ORACLES = {
    "q_search_bm25": SQL_SEARCH_BM25,
    "q_search_phrase": SQL_SEARCH_PHRASE,
    "q_search_fuzzy": SQL_SEARCH_FUZZY,
    "q_search_mlt": SQL_SEARCH_MLT,
    "q_search_sigterms": SQL_SEARCH_SIGTERMS,
    "q_search_suggest": SQL_SEARCH_SUGGEST,
    "q_search_highlight": SQL_SEARCH_HIGHLIGHT,
    "q_search_bool": SQL_SEARCH_BOOL,
    "q_search_prefix": SQL_SEARCH_PREFIX,
    "q_search_phrase_prefix": SQL_SEARCH_PHRASE_PREFIX,
    "q_search_wildcard": SQL_SEARCH_WILDCARD,
    "q_search_regexp": SQL_SEARCH_REGEXP,
    "q_get_by_key": SQL_GET_BY_KEY,
}
