"""Search result-shaping surface: collapse, function_score, rank_feature,
terms_set — the ES query-DSL pieces that shape or re-rank hit lists.

The reference delegates all querying to Elasticsearch (/root/reference
README.md:3; ES dependency pom.xml:35-46), so the ES query DSL is the
behavioral contract (SURVEY.md §2-B). search.py owns match/phrase/fuzzy/
prefix/wildcard/bool; this module owns the result-shaping layer on top:

* `collapse`       — q_search_collapse       (field collapsing: best hit per
                     collapse key + inner-hit count)
* `function_score` — q_search_function_score (query score × field_value_factor
                     × numeric decay)
* `rank_feature`   — q_search_rank_feature   (saturation scoring on a feature
                     column)
* `terms_set`      — q_search_terms_set      (minimum_should_match over a term
                     set)

Determinism (the search.py rule): no libm — ES's log/exp score shapes are
replaced by rational forms with identical monotonicity (saturation x/(x+k) IS
ES's rank_feature saturation, already rational; the decay is the rational
1/(1+dist/scale) form), every float expression a fixed association order
mirrored literally in the SQL twin; ties broken by unique doc_id everywhere.

Scale: collapse is ONE map-side-combined max_by aggregate (the
q_agg_topmetrics posture — each partition carries one running best hit per
collapse key; the exchange moves groups, not hits), never a per-group window
sort. function_score/rank_feature are pure whole-stage-codegen column math
over the scan with a TakeOrdered top-k (per-partition heap + driver merge of
k rows, no global sort). terms_set is a map-only filter — the term set is a
literal array, no join at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

COLLAPSE_TERM = "vector"
FS_TERM = "merge"
FS_SCALE = 500.0  # decay scale (doc_id units — recency proxy, see docstring)
FS_FVF = 2000.0  # field_value_factor divisor on n_chars
RF_PIVOT = 256.0  # rank_feature saturation pivot (chars)
TOP_K = 20

TERMS_SET = ("vector", "merge", "stream", "batch")
MIN_SHOULD_MATCH = 2


def _toks() -> Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def _tf(term: str) -> Column:
    return F.size(F.filter(_toks(), lambda t: t == F.lit(term)))


_SQL_TF = "len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''), t -> t = '{term}'))"


def q_search_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `collapse` on `source`: for documents matching the term query, keep
    only the best hit per source plus the collapsed inner-hit count — the
    one-result-per-domain dedup every search UI applies.

    Relevance here is term frequency with doc_id as the unique tiebreak
    (rational BM25 adds corpus-stat plumbing that q_search_bm25 already
    covers; collapse semantics are the point). The whole query is ONE
    aggregate: max_by(hit_struct, (tf, −doc_id)) — a per-partition running
    argmax per collapse key, merged on the shuffle exactly like ES collapses
    per-shard then reduces. No window, no per-group sort: at 100 TB the
    exchange carries one candidate per (partition, source), not the hit list.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", _tf(COLLAPSE_TERM).alias("tf")
    )
    hits = d.filter(F.col("tf") > 0)
    best = F.max_by(
        F.struct(F.col("doc_id"), F.col("tf"), F.col("n_chars")),
        F.struct(F.col("tf"), (-F.col("doc_id")).alias("neg_id")),
    )
    return hits.groupBy("source").agg(
        F.count(F.lit(1)).alias("inner_hits"),
        best["doc_id"].alias("top_doc_id"),
        best["tf"].cast("int").alias("top_tf"),
        best["n_chars"].alias("top_n_chars"),
    )


SQL_SEARCH_COLLAPSE = f"""
WITH hits AS (
    SELECT doc_id, source, n_chars,
           {_SQL_TF.format(term=COLLAPSE_TERM)} AS tf
    FROM documents
),
ranked AS (
    SELECT source, doc_id, tf, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY tf DESC, doc_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS inner_hits
    FROM hits WHERE tf > 0
)
SELECT source, inner_hits, doc_id AS top_doc_id,
       CAST(tf AS INTEGER) AS top_tf, n_chars AS top_n_chars
FROM ranked WHERE rn = 1
"""


def q_search_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `function_score`: the term query's score multiplied by a
    field_value_factor on document length and a numeric decay on document age,
    top-20 — boost long documents, damp old ones.

    Rational re-expression of ES's shapes (the search.py no-libm rule):
    field_value_factor(log1p) → (1 + n_chars/{FS_FVF:.0f}); gauss decay →
    the rational {FS_SCALE:.0f}/({FS_SCALE:.0f} + doc_id), with doc_id as the
    age proxy (the fixture has no document timestamp — disclosed). Association
    order is ((tf · fvf) · decay), mirrored literally in the SQL twin. Pure
    column math over the scan; top-k is a TakeOrdered heap, never a global
    sort.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", _tf(FS_TERM).alias("tf")
    )
    fvf = F.lit(1.0) + F.col("n_chars").cast("double") / F.lit(FS_FVF)
    decay = F.lit(FS_SCALE) / (F.lit(FS_SCALE) + F.col("doc_id").cast("double"))
    score = (F.col("tf").cast("double") * fvf) * decay
    return (
        d.filter(F.col("tf") > 0)
        .select("doc_id", F.col("tf").cast("int").alias("tf"), score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


SQL_SEARCH_FUNCTION_SCORE = f"""
WITH hits AS (
    SELECT doc_id, n_chars,
           {_SQL_TF.format(term=FS_TERM)} AS tf
    FROM documents
)
SELECT doc_id, CAST(tf AS INTEGER) AS tf,
       (CAST(tf AS DOUBLE) * (1.0 + CAST(n_chars AS DOUBLE) / {FS_FVF}))
           * ({FS_SCALE} / ({FS_SCALE} + CAST(doc_id AS DOUBLE))) AS score
FROM hits WHERE tf > 0
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


def q_search_rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `rank_feature` query with the default saturation function:
    score = x/(x + pivot) over the n_chars feature, gated by a term query —
    static document-quality ranking (ES's pagerank/url_length example),
    top-20.

    ES's saturation IS rational — this is the one scoring shape the engine
    reproduces exactly, not by substitution. One division per row in a fixed
    order; filter + column math + TakeOrdered, the flattest possible search
    plan.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", _tf(COLLAPSE_TERM).alias("tf")
    )
    x = F.col("n_chars").cast("double")
    score = x / (x + F.lit(RF_PIVOT))
    return (
        d.filter(F.col("tf") > 0)
        .select("doc_id", "n_chars", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


SQL_SEARCH_RANK_FEATURE = f"""
WITH hits AS (
    SELECT doc_id, n_chars,
           {_SQL_TF.format(term=COLLAPSE_TERM)} AS tf
    FROM documents
)
SELECT doc_id, n_chars,
       CAST(n_chars AS DOUBLE) / (CAST(n_chars AS DOUBLE) + {RF_PIVOT}) AS score
FROM hits WHERE tf > 0
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


def q_search_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `terms_set` query: documents containing at least
    `minimum_should_match`={MIN_SHOULD_MATCH} of the term set, with the match
    count and the matched terms themselves (ES's named-queries introspection).

    The matched set filters the CONSTANT term list against each document's
    tokens — its order is the term-set literal's order on both engines by
    construction, and it is emitted space-joined as a single STRING column
    (`array_join` / `array_to_string`), per the registry-wide scalar-output
    contract (registry.py). Map-only: the term set is a literal array, the
    plan is scan → filter → project, no join and no shuffle at any scale.
    """
    d = table(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in TERMS_SET])
    tk = _toks()
    matched = F.filter(terms, lambda t: F.array_contains(tk, t))
    out = d.select(
        "doc_id",
        F.array_join(matched, " ").alias("matched_terms"),
        F.size(matched).cast("int").alias("n_matched"),
    )
    return out.filter(F.col("n_matched") >= MIN_SHOULD_MATCH)


_SQL_TERMS_LIT = "[" + ", ".join(f"'{t}'" for t in TERMS_SET) + "]"

SQL_SEARCH_TERMS_SET = f"""
WITH m AS (
    SELECT doc_id,
           list_filter({_SQL_TERMS_LIT},
                       t -> list_contains(
                           list_filter(string_split(text, ' '), x -> x <> ''), t))
               AS matched
    FROM documents
)
SELECT doc_id, array_to_string(matched, ' ') AS matched_terms,
       CAST(len(matched) AS INTEGER) AS n_matched
FROM m WHERE len(matched) >= {MIN_SHOULD_MATCH}
"""


QUERIES = {
    "q_search_collapse": q_search_collapse,
    "q_search_function_score": q_search_function_score,
    "q_search_rank_feature": q_search_rank_feature,
    "q_search_terms_set": q_search_terms_set,
}

ORACLES = {
    "q_search_collapse": SQL_SEARCH_COLLAPSE,
    "q_search_function_score": SQL_SEARCH_FUNCTION_SCORE,
    "q_search_rank_feature": SQL_SEARCH_RANK_FEATURE,
    "q_search_terms_set": SQL_SEARCH_TERMS_SET,
}
