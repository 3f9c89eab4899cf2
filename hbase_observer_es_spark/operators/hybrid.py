"""Hybrid retrieval: reciprocal-rank fusion of a lexical ranking and a vector
(cosine-kNN) ranking — ES's `rrf` rank method, the headline hybrid-search
feature that fuses BM25 hits with kNN hits.

The reference delegates retrieval to Elasticsearch (/root/reference
README.md:3); modern ES answers hybrid queries by running a full-text query
and a kNN query and fusing with RRF: score(d) = Σ 1/(k + rank_i(d)) over the
rankings that contain d (public ES/OpenSearch semantics; Cormack et al.'s
original RRF). The fixture's documents/embeddings tables share the 0..499 id
domain (TESTDATA.md), standing in for a corpus with both a text and an
embedding column.

Determinism: RRF is rational by construction — 1/(k + integer rank) — so the
fused score is exact IEEE arithmetic in a fixed (lexical + vector) order; both
per-side rankings carry unique tiebreaks (doc_id / vec_id); the cosine reuses
similarity.py's fold-exact dot product (bit-identical to DuckDB's list_reduce).

Scale: each side is the flat retrieval shape its family already pins — the
lexical side map-only tf + TakeOrdered, the vector side a broadcast probe +
map-only cosine + TakeOrdered. RRF then operates on two ≤FUSE_N-row frames:
the rank windows and the full-outer fusion join touch a constant number of
rows at ANY corpus size — fusion cost is O(FUSE_N), never O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from .similarity import PROBE_VEC_ID, _cosine, _sql_cosine

RRF_K = 60  # ES rank_constant default
FUSE_N = 50  # per-ranking candidate depth (ES window_size)
RRF_TERM = "vector"
TOP_K = 10


def q_search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: top-{TOP_K} documents by RRF over (a) the term ranking
    on text and (b) the cosine-kNN ranking against the probe embedding
    (vec_id={PROBE_VEC_ID}), each at candidate depth {FUSE_N}.

    score = Σ_sides 1/({RRF_K} + rank); a document absent from a side
    contributes 0 for that side (ES semantics). Ranks come from row_number
    over each side's ALREADY-TRUNCATED TakeOrdered frame — the windows are
    single-partition by construction but over ≤{FUSE_N} rows, which is the
    point: fusion never sees the corpus.
    """
    d = table(spark, sf_dir, "documents")
    tf = F.size(
        F.filter(
            F.filter(F.split(F.col("text"), " "), lambda t: t != ""),
            lambda t: t == F.lit(RRF_TERM),
        )
    )
    lex0 = (
        d.select("doc_id", tf.alias("tf"))
        .filter(F.col("tf") > 0)
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(FUSE_N)
    )
    w_lex = Window.orderBy(F.desc("tf"), F.asc("doc_id"))
    lex = lex0.select(
        "doc_id", F.row_number().over(w_lex).cast("int").alias("r_lex")
    )

    e = table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_emb")
    )
    cos = _cosine(F.col("embedding"), F.col("probe_emb"))
    vec0 = (
        e.filter(F.col("vec_id") != PROBE_VEC_ID)
        .join(F.broadcast(probe))
        .select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(FUSE_N)
    )
    w_vec = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    vec = vec0.select(
        "vec_id", F.row_number().over(w_vec).cast("int").alias("r_vec")
    )

    fused = lex.join(vec, lex.doc_id == vec.vec_id, "outer").select(
        F.coalesce(lex.doc_id, vec.vec_id).alias("id"),
        "r_lex",
        "r_vec",
    )
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("r_lex").cast("double")),
        F.lit(0.0),
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("r_vec").cast("double")),
        F.lit(0.0),
    )
    return (
        fused.select("id", "r_lex", "r_vec", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("id"))
        .limit(TOP_K)
    )


SQL_SEARCH_HYBRID_RRF = f"""
WITH lex0 AS (
    SELECT doc_id,
           len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
                           t -> t = '{RRF_TERM}')) AS tf
    FROM documents
    WHERE len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
                          t -> t = '{RRF_TERM}')) > 0
    ORDER BY tf DESC, doc_id ASC
    LIMIT {FUSE_N}
),
lex AS (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY tf DESC, doc_id ASC) AS INTEGER)
               AS r_lex
    FROM lex0
),
probe AS (
    SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
),
vec0 AS (
    SELECT vec_id, {_sql_cosine("embedding", "probe_emb")} AS cos_sim
    FROM embeddings, probe
    WHERE vec_id <> {PROBE_VEC_ID}
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT {FUSE_N}
),
vec AS (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INTEGER)
               AS r_vec
    FROM vec0
)
SELECT COALESCE(l.doc_id, v.vec_id) AS id, l.r_lex, v.r_vec,
       COALESCE(1.0 / ({RRF_K}.0 + CAST(l.r_lex AS DOUBLE)), 0.0)
           + COALESCE(1.0 / ({RRF_K}.0 + CAST(v.r_vec AS DOUBLE)), 0.0)
           AS rrf_score
FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.vec_id
ORDER BY rrf_score DESC, id ASC
LIMIT {TOP_K}
"""


QUERIES = {"q_search_hybrid_rrf": q_search_hybrid_rrf}
ORACLES = {"q_search_hybrid_rrf": SQL_SEARCH_HYBRID_RRF}
