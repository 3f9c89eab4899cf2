"""ANN quality evaluation: recall of the approximate index against exact
ground truth — the query every ANN deployment runs before trusting an index
(north-star similarity family; no reference analogue — the reference ships
vectors nowhere, SURVEY.md §2-B).

`q_ann_recall` computes per-probe recall@K of the LSH index (q_sim_lsh_batch)
against brute-force exact top-K. Everything numeric reuses the similarity
module's fold-exact cosine, so both the index side and the truth side are
bit-identical to the DuckDB oracle; recall itself is an integer intersection
count with one final double division.

Scale: recall evaluation NEVER runs over the full corpus at 100 TB — it runs
exactly like this, on a bounded probe sample (here every PROBE_MOD-th vector)
whose brute-force side is |probes|·|corpus| cosine folds, throttled by the
probe count; the probe frame broadcasts. The LSH side is the production
banded plan unchanged — evaluating the index exercises the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fan_out, table
from .similarity import (
    K,
    PROBE_MOD,
    SQL_SIM_LSH_BATCH,
    _dot,
    _norm,
    _sql_cosine,
    q_sim_lsh_batch,
)


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-probe recall@K of LSH ANN vs exact top-K: (probe_id, n_hits,
    recall). Exact side: probes broadcast against the corpus, fold-exact
    cosine, deterministic (cos DESC, vec_id ASC) tie-break — the same total
    order the LSH re-rank uses, so set equality is well-defined.

    Norms are hoisted to per-VECTOR columns (the q_sim_lsh_batch lesson —
    the pair fan-out otherwise re-folds both norms per pair, 3 folds where 1
    suffices; measured 4.7 → ~2.5 s at sf0.1). Same values, same fold — the
    oracle's inline cosine computes the identical norm either way."""
    e = fan_out(table(spark, sf_dir, "embeddings"))  # r17: spread the exact folds
    v = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    probes = v.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_emb"),
        F.col("nrm").alias("pnrm"),
    )
    scored = (
        v.join(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            (
                _dot(F.col("embedding"), F.col("probe_emb"))
                / (F.col("nrm") * F.col("pnrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    exact = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        .select("probe_id", "vec_id")
    )
    lsh = q_sim_lsh_batch(spark, sf_dir).select(
        "probe_id", "vec_id", F.lit(1).alias("hit")
    )
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        exact.join(lsh, ["probe_id", "vec_id"], "left")
        .groupBy("probe_id")
        .agg(hits.cast("bigint").alias("n_hits"))
        .select(
            "probe_id",
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(float(K))).alias("recall"),
        )
    )


SQL_ANN_RECALL = f"""
WITH lsh AS ({SQL_SIM_LSH_BATCH}),
probes AS (
    SELECT vec_id AS probe_id, embedding AS probe_emb
    FROM embeddings WHERE vec_id % {PROBE_MOD} = 0
),
scored AS (
    SELECT probe_id, vec_id,
           {_sql_cosine('embedding', 'probe_emb')} AS cos_sim
    FROM embeddings, probes
    WHERE vec_id <> probe_id
),
exact AS (
    SELECT probe_id, vec_id FROM (
        SELECT probe_id, vec_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos_sim DESC, vec_id ASC) AS rk
        FROM scored
    ) WHERE rk <= {K}
)
SELECT e.probe_id AS probe_id,
       CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST({K} AS DOUBLE) AS recall
FROM exact e LEFT JOIN lsh l
  ON e.probe_id = l.probe_id AND e.vec_id = l.vec_id
GROUP BY e.probe_id
"""


QUERIES = {"q_ann_recall": q_ann_recall}
ORACLES = {"q_ann_recall": SQL_ANN_RECALL}
