"""Contrastive triplet mining over the embedding table — the training-data op
that turns a labeled corpus into (anchor, positive, hard-negative) triplets
for metric-learning / embedding-model fine-tuning.

No reference analogue (the reference is CDC glue); this belongs to the
LLM-data-pipeline family mandated alongside SURVEY.md §2 — the similarity
family's training-side counterpart to q_ann_recall's evaluation side.

Semantics: for each anchor, the positive is the most-similar SAME-label
vector and the hard negative the most-similar OTHER-label vector; the margin
(pos_cos − neg_cos) is the number a curriculum builder thresholds on (small
or negative margin = hard triplet).

Determinism: cosine is similarity.py's fold-exact dot product (bit-identical
to DuckDB's list_reduce); argmax keys are (cos, −vec_id) — unique, so both
engines pick the same neighbor; the margin is one IEEE subtraction.

Scale: the anchor set is the bounded side (|anchors| rows, broadcast) — the
corpus is scanned ONCE, map-only, and reduced by a combiner argmax per
(anchor, same/other) cell: the exchange carries 2·|anchors| running pairs per
partition, never scored rows. This is the q_ann_recall posture: cost is
|anchors|·|corpus| compares by definition of exact mining; at 100 TB the
anchor batch is what you size (or you mine from an LSH/IVF candidate set —
same downstream shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import fan_out, table
from .similarity import _cosine, _sql_cosine

N_ANCHORS = 5  # anchors = vec_id 0..4 (deterministic, label-diverse in fixture)


def q_sim_triplet_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine one (positive, hard-negative) pair per anchor (vec_id <
    {N_ANCHORS}) by exact cosine — see module docstring for the plan shape.

    The per-cell argmax is max(when(cond, struct(cos, −vec_id))) — a plain
    map-side-combinable MAX over a struct whose lexicographic order IS the
    (best cos, then lowest id) rule; nulls (rows of the other cell) are
    ignored by MAX on both engines.
    """
    e = fan_out(table(spark, sf_dir, "embeddings"))  # r17: spread the folds
    anchors = e.filter(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_emb"),
    )
    pairs = e.join(F.broadcast(anchors), F.col("vec_id") != F.col("a_id"))
    cos = _cosine(F.col("embedding"), F.col("a_emb"))
    scored = pairs.select(
        "a_id",
        "a_label",
        "vec_id",
        (F.col("label") == F.col("a_label")).alias("same"),
        cos.alias("cos"),
    )
    key = F.struct(F.col("cos"), (-F.col("vec_id")).alias("nid"))
    agg = scored.groupBy("a_id", "a_label").agg(
        F.max(F.when(F.col("same"), key)).alias("p"),
        F.max(F.when(~F.col("same"), key)).alias("n"),
    )
    return agg.select(
        "a_id",
        "a_label",
        (-F.col("p.nid")).cast("bigint").alias("pos_id"),
        F.col("p.cos").alias("pos_cos"),
        (-F.col("n.nid")).cast("bigint").alias("neg_id"),
        F.col("n.cos").alias("neg_cos"),
        (F.col("p.cos") - F.col("n.cos")).alias("margin"),
    )


SQL_SIM_TRIPLET_MINE = f"""
WITH anchors AS (
    SELECT vec_id AS a_id, label AS a_label, embedding AS a_emb
    FROM embeddings WHERE vec_id < {N_ANCHORS}
),
scored AS (
    SELECT a.a_id, a.a_label, e.vec_id,
           e.label = a.a_label AS same,
           {_sql_cosine("e.embedding", "a.a_emb")} AS cos
    FROM embeddings e JOIN anchors a ON e.vec_id <> a.a_id
),
cells AS (
    SELECT a_id, a_label,
           MAX(CASE WHEN same THEN {{'cos': cos, 'nid': -vec_id}} END) AS p,
           MAX(CASE WHEN NOT same THEN {{'cos': cos, 'nid': -vec_id}} END) AS n
    FROM scored GROUP BY a_id, a_label
)
SELECT a_id, a_label,
       CAST(-p.nid AS BIGINT) AS pos_id, p.cos AS pos_cos,
       CAST(-n.nid AS BIGINT) AS neg_id, n.cos AS neg_cos,
       p.cos - n.cos AS margin
FROM cells
"""


KNN_F_K = 5
KNN_F_PROBE = 0  # similarity.PROBE_VEC_ID — restated for the SQL literal


def q_sim_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8 filtered kNN: top-k cosine neighbors of the probe among vectors
    passing a metadata PRE-filter (label ≠ probe's label, the
    cross-class-neighbor query) — distinct from post-filtering a plain top-k,
    which can return fewer than k (or zero) survivors. ES evaluates the filter
    DURING graph traversal for exactly this reason; the engine's analogue
    applies it before the TakeOrdered cut.

    Plan shape is q_sim_knn's: 1-row probe broadcast, map-only cosine over
    the filtered scan, TakeOrdered heap — the filter rides the scan, so the
    pre/post distinction costs nothing here while preserving the k-results
    contract.
    """
    e = table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == KNN_F_PROBE).select(
        F.col("embedding").alias("probe_emb"),
        F.col("label").alias("probe_label"),
    )
    cos = _cosine(F.col("embedding"), F.col("probe_emb"))
    return (
        e.join(F.broadcast(probe))
        .filter(
            (F.col("vec_id") != KNN_F_PROBE)
            & (F.col("label") != F.col("probe_label"))
        )
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(KNN_F_K)
    )


SQL_SIM_KNN_FILTERED = f"""
WITH probe AS (
    SELECT embedding AS probe_emb, label AS probe_label
    FROM embeddings WHERE vec_id = {KNN_F_PROBE}
)
SELECT vec_id, label,
       {_sql_cosine("embedding", "probe_emb")} AS cos_sim
FROM embeddings, probe
WHERE vec_id <> {KNN_F_PROBE} AND label <> probe_label
ORDER BY cos_sim DESC, vec_id ASC
LIMIT {KNN_F_K}
"""


QUERIES = {
    "q_sim_triplet_mine": q_sim_triplet_mine,
    "q_sim_knn_filtered": q_sim_knn_filtered,
}
ORACLES = {
    "q_sim_triplet_mine": SQL_SIM_TRIPLET_MINE,
    "q_sim_knn_filtered": SQL_SIM_KNN_FILTERED,
}
