"""ES `rescore` API — two-phase ranking: cheap top-window, expensive re-rank.

ES 6.3 (/root/reference/pom.xml:35-46) lets a search request attach a
`rescore` block: the primary query ranks the corpus, the top `window_size`
hits are re-scored by a (typically costlier) secondary query, and the final
score is ``query_weight * primary + rescore_query_weight * secondary``
within the window. The two ingredients were already green in this registry
(q_search_bm25's scoring, q_search_function_score's shapes); this composes
them into the two-phase operator (round-7 verdict, What's missing #5).

Semantics implemented (the standard window ≫ k usage): the top-10 of the
rescored window is returned — `window_size`=100 first-pass hits re-scored,
never the corpus. Weights are explicit (`query_weight`=1.0,
`rescore_query_weight`=1.5) and every float op is rational (D10 rule), so
the result hash-verifies against the DuckDB twin.

Scale posture: phase 1 is exactly q_search_bm25's plan — one corpus scan for
per-doc term stats, one broadcast 1-row stats frame, and the window cut is a
TakeOrdered (per-partition heap + driver merge of window_size rows), never a
global sort. Phase 2 is column math over the 100-row window frame — cost
O(window), independent of corpus size, and it re-scans NOTHING (the rescore
fields ride along from phase 1's projection; plan-pinned ≤ 2 corpus scans,
both from phase 1's scoring shape). On a 1000-executor cluster the rescore
phase is a single tiny task — exactly ES's cost model for the API.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import fan_out, table
from .search import B, K1, QUERY_TERMS, TOP_K, _toks

RESCORE_WINDOW = 100
QUERY_WEIGHT = 1.0
RESCORE_QUERY_WEIGHT = 1.5
# rescore query: function_score-shaped rational boost — favor long documents
# (field_value_factor analogue), damp by doc age proxy (gauss-decay analogue;
# the fixture has no document timestamp — same disclosure as
# q_search_function_score)
RS_FVF = 1000.0
RS_SCALE = 400.0


def q_search_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `rescore`: BM25 top-100 window, function_score re-rank WITHIN it,
    final = 1.0·bm25 + 1.5·rescore, top-10."""
    # fan_out (r17 gate A/B: 1.09 -> 0.81 s median, the q_search_bm25 spread)
    d = fan_out(table(spark, sf_dir, "documents")).select(
        "doc_id", "n_chars", _toks().alias("tk")
    )

    def cnt(w: str) -> Column:
        return F.size(F.filter(F.col("tk"), lambda t: t == w))

    cnt_cols = [cnt(w).alias(f"c{i}") for i, w in enumerate(QUERY_TERMS)]
    cnts = d.select(
        "doc_id", "n_chars", F.size(F.col("tk")).alias("dl"), *cnt_cols
    )
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

    primary = term_score(0) + term_score(1) + term_score(2)
    # phase 1: the window cut — TakeOrdered of window_size rows, doc_id
    # tie-broken so the window boundary is deterministic cross-engine
    window = (
        scored.select("doc_id", "n_chars", primary.alias("qscore"))
        .filter(F.col("qscore") > 0)
        .orderBy(F.desc("qscore"), F.asc("doc_id"))
        .limit(RESCORE_WINDOW)
    )
    # phase 2: rescore WITHIN the window only — pure column math, no new scan
    fvf = F.lit(1.0) + F.col("n_chars").cast("double") / F.lit(RS_FVF)
    decay = F.lit(RS_SCALE) / (F.lit(RS_SCALE) + F.col("doc_id").cast("double"))
    rescore = fvf * decay
    combined = (
        F.lit(QUERY_WEIGHT) * F.col("qscore")
        + F.lit(RESCORE_QUERY_WEIGHT) * rescore
    )
    return (
        window.select(
            "doc_id",
            F.col("qscore").alias("query_score"),
            combined.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


def _sql_term_score(i: int) -> str:
    return (
        f"((n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (CAST(c{i} AS DOUBLE) * {K1 + 1.0})"
        f" / (CAST(c{i} AS DOUBLE) + {K1} * ({1.0 - B} + {B} * CAST(dl AS DOUBLE) / avgdl))"
    )


SQL_SEARCH_RESCORE = f"""
WITH tks AS (
    SELECT doc_id, n_chars, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
),
cnts AS (
    SELECT doc_id, n_chars, len(tk) AS dl,
           {", ".join(
               f"len(list_filter(tk, t -> t = '{w}')) AS c{i}"
               for i, w in enumerate(QUERY_TERMS)
           )}
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
),
win AS (
    SELECT doc_id, n_chars,
           {" + ".join(_sql_term_score(i) for i in range(len(QUERY_TERMS)))} AS qscore
    FROM cnts, stats
    WHERE {" + ".join(_sql_term_score(i) for i in range(len(QUERY_TERMS)))} > 0
    ORDER BY qscore DESC, doc_id ASC
    LIMIT {RESCORE_WINDOW}
)
SELECT doc_id, qscore AS query_score,
       {QUERY_WEIGHT} * qscore
         + {RESCORE_QUERY_WEIGHT} * ((1.0 + CAST(n_chars AS DOUBLE) / {RS_FVF})
                                      * ({RS_SCALE} / ({RS_SCALE} + CAST(doc_id AS DOUBLE)))) AS score
FROM win
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


QUERIES = {"q_search_rescore": q_search_rescore}
ORACLES = {"q_search_rescore": SQL_SEARCH_RESCORE}
