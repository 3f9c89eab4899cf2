"""True logarithmic relevance scoring — the ln-idf twins of the rational surface.

The reference delegates search to Elasticsearch 6.3 (/root/reference/pom.xml:35-46),
whose Lucene BM25 uses the LOG idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``
(Lucene `BM25Similarity.idf`). This repo's primary search surface (search.py,
D10) replaces the log with its rational argument so every float op is
IEEE-exact and cross-engine hash-verifiable. That preserves per-term
monotonicity but can reorder MULTI-term rankings where term-weight RATIOS
flip — the one fidelity gap a search user could notice.

This module closes the gap from disclosed to MEASURED:

* ``q_search_bm25_ln`` / ``q_search_mlt_ln`` — the same pipelines with the
  real ES 6.3 ln idf. Registered WITHOUT oracle SQL (rows-only driver check):
  JVM ``Math.log`` and DuckDB's libm ``ln`` are each correctly-rounded to
  ~1 ulp but not guaranteed to agree bit-for-bit, and the driver compares
  doubles by exact shortest-roundtrip repr.
* ``LN_SQL_*`` — the DuckDB twins, used by tests/test_search_ln.py to MEASURE
  the cross-engine drift (per-value relative tolerance) instead of hashing it,
  plus a rank-agreement test quantifying how far the rational rankings sit
  from the true-ln rankings on the fixtures.

Scale posture is identical to the rational twins (search.py docstring): the
corpus stats are one map-side-combined broadcast row, scoring is whole-stage
codegen column math (ln included), top-k is TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fan_out, table
from .search import (
    B,
    K1,
    MLT_DOC_ID,
    MLT_MAX_QUERY_TERMS,
    MLT_MIN_DF,
    QUERY_TERMS,
    TOP_K,
    _toks,
)


def _ln_idf(df_col: Column, n_col: Column) -> Column:
    """Lucene BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)). F.log is natural."""
    return F.log(F.lit(1.0) + (n_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def q_search_bm25_ln(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with the true ES 6.3 log idf — q_search_bm25's ln twin.

    score(d) = Σ_t ln(1+(N−df_t+0.5)/(df_t+0.5)) · cnt_t·(k1+1)
               / (cnt_t + k1·(1−b + b·dl/avgdl)); k1=1.2, b=0.75, top-10.
    """
    # fan_out (r17 gate A/B: 1.16 -> 0.76 s median, the q_search_bm25 spread)
    d = fan_out(table(spark, sf_dir, "documents")).select("doc_id", _toks().alias("tk"))

    def cnt(w: str) -> Column:
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
        idf = _ln_idf(F.col(f"df{i}"), F.col("n"))
        denom = cnt + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / F.col("avgdl"))
        return idf * (cnt * F.lit(K1 + 1.0)) / denom

    score = term_score(0) + term_score(1) + term_score(2)
    return (
        scored.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


def q_search_mlt_ln(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this with the true log idf — q_search_mlt's ln twin.

    Same three ES stages (rarity-ranked term selection from the probe doc,
    broadcast of the ≤8-term dim onto corpus doc-term pairs, per-doc score),
    with idf = ln(1+(N−df+0.5)/(df+0.5)). The per-doc sum keeps the sorted
    fold so float addition order stays partition-independent.
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
    matched = (
        pairs.filter(F.col("doc_id") != MLT_DOC_ID)
        .join(F.broadcast(selected), "t")
        .join(F.broadcast(stats))
        .select("doc_id", "t", _ln_idf(F.col("df"), F.col("n")).alias("idf"))
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


# ---------------------------------------------------------------------------
# DuckDB twins — test-side measurement ONLY, deliberately NOT in ORACLES:
# the driver's exact-repr hash cannot be guaranteed across two independent
# libm ln implementations. tests/test_search_ln.py compares these with a
# per-value relative tolerance instead.
# ---------------------------------------------------------------------------


def _ln_sql_term_score(i: int) -> str:
    return (
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (CAST(c{i} AS DOUBLE) * {K1 + 1.0})"
        f" / (CAST(c{i} AS DOUBLE) + {K1} * ({1.0 - B} + {B} * CAST(dl AS DOUBLE) / avgdl))"
    )


def _ln_sql_cnt(w: str) -> str:
    return f"len(list_filter(tk, t -> t = '{w}'))"


LN_SQL_SEARCH_BM25 = f"""
WITH tks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
    FROM documents
),
cnts AS (
    SELECT doc_id, len(tk) AS dl,
           {", ".join(f"{_ln_sql_cnt(w)} AS c{i}" for i, w in enumerate(QUERY_TERMS))}
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
       {" + ".join(_ln_sql_term_score(i) for i in range(len(QUERY_TERMS)))} AS score
FROM cnts, stats
WHERE {" + ".join(_ln_sql_term_score(i) for i in range(len(QUERY_TERMS)))} > 0
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""

LN_SQL_SEARCH_MLT = f"""
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
    SELECT p.doc_id, p.t, ln(1.0 + (n - df + 0.5) / (df + 0.5)) AS idf
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


QUERIES = {
    "q_search_bm25_ln": q_search_bm25_ln,
    "q_search_mlt_ln": q_search_mlt_ln,
}

# No ORACLES on purpose — rows-only driver entries; see module docstring.
ORACLES: dict[str, str] = {}
