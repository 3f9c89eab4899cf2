"""Dedup-index evaluation: LSH pair recall against exact ground truth.

``q_ann_recall`` measures the LSH *similarity* index; nothing measured the
LSH *dedup* index — yet MinHash banding is a recall gamble by construction
(a near-dup pair is found only if SOME band's rows all collide), and a
pipeline that deduplicates with it should know the miss rate, not assume
the textbook S-curve. This operator runs BOTH sides over the same
word-trigram shingle space ``q_dedup_minhash`` uses and reports exact
integer counts:

* **truth** — EXACT shingle-Jaccard ≥ threshold via the co-occurrence
  identity (inverted-index equi-join on the shingle hash; r12 — the
  all-pairs BNLJ form cost 216 s at sf0.1 for identical rows). Still
  fenced: the ground truth is this module's product and no other
  query's closure may reach it. The DuckDB oracle keeps the
  independent ALL-PAIRS formulation, so the identity itself is
  hash-checked.
* **found** — ``q_dedup_minhash``'s output verbatim (its own exact verify
  makes precision 1 by construction; ``n_extra`` measuring 0 CHECKS that
  claim instead of restating it).
* one row: ``(n_truth, n_found, n_common, n_missed, n_extra)`` — recall
  is ``n_common / n_truth``, the caller's single division (kept out of
  the oracle-checked columns, the ``drift.py`` rule).

Every shingle/hash/jaccard expression is IMPORTED from ``operators/
dedup.py`` (Spark helpers and the SQL format constants alike), so the
evaluator can never drift from the thing it evaluates — the
``SQL_SPANS_CTE`` single-sourcing rule.

Registered r12: ``q_dedup_lsh_recall`` + ``SQL_DEDUP_LSH_RECALL``
(DuckDB-hash-checked in ``tests/test_dedup_eval.py`` since r10). Its
quadratic truth side (``_truth_pairs``) is fenced like dedup.py's
baselines: no OTHER registered query's closure may reach it
(tests/test_plans.py::test_quadratic_jaccard_ground_truth_is_fenced).

Reference parity: no analogue in the reference tree — beyond-reference
pipeline surface (SURVEY §2-D), the dedup twin of ``q_ann_recall``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import persist_tracked
from .dedup import (
    JACCARD_THRESHOLD,
    SQL_DEDUP_MINHASH,
    _shingled_docs,
    _SQL_JACCARD,
    q_dedup_minhash,
)

# The shingle-space CTEs (toksf/thash/shing) sliced VERBATIM out of
# dedup.py's own SQL string — sourced, not copied, so the truth side can
# never drift from the pipeline it evaluates. The assert trips loudly if
# dedup.py ever reshapes its CTE prefix.
_SHINGLE_CTES = SQL_DEDUP_MINHASH.split("\nminh AS")[0].split("WITH ", 1)[1]
assert _SHINGLE_CTES.lstrip().startswith("toksf AS") and _SHINGLE_CTES.rstrip().endswith(
    "FROM thash),"
), _SHINGLE_CTES


def _truth_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT shingle-Jaccard ≥ threshold pairs via the co-occurrence
    identity: |A∩B| comes from an inverted-index equi-self-join on the
    shingle hash (a pair sharing NO shingle has J = 0 and can never
    qualify, so the join loses nothing), |A∪B| = |A| + |B| − |A∩B| from
    the per-doc distinct-set sizes carried through the explode. Replaces
    the r10 all-pairs BNLJ form — 216 s at sf0.1, quadratic compute —
    with one shuffle linear in shingle occurrences plus the co-occurring
    pair count: the shape exact ground truth actually takes at 100 TB.
    Near-unique trigram shingles keep join buckets tiny; a
    boilerplate-heavy corpus would cap or salt hot shingles (the
    q_dedup_substring skew discipline). Same rows, same doubles (the
    intersection/union INTEGERS are identical), so the all-pairs DuckDB
    oracle stays the independent mirror."""
    sh = persist_tracked(
        _shingled_docs(spark, sf_dir), "dedup_eval.truth.shingles"
    )
    # materialize the cache BEFORE the self-join: a lazily-persisted frame
    # referenced by both join branches of one job computes the (expensive)
    # shingle+rollhash pipeline once per branch before the cache exists —
    # the one count() action pays for itself ~3x over (r16 A/B at sf0.1:
    # ~5.5 s -> ~3.9 s; the same move measured NEUTRAL-to-NEGATIVE for the
    # cheap-pipeline persists in minhash/boilerplate/datehist, which keep
    # their lazy persist)
    sh.count()
    ex = sh.select(
        "doc_id", F.size("hs").alias("sz"), F.explode("hs").alias("h")
    )
    a = ex.select(
        F.col("doc_id").alias("a_id"), F.col("sz").alias("a_sz"), "h"
    )
    b = ex.select(
        F.col("doc_id").alias("b_id"), F.col("sz").alias("b_sz"), "h"
    )
    co = (
        a.join(b, "h")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id", "a_sz", "b_sz")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    union = (F.col("a_sz") + F.col("b_sz") - F.col("inter")).cast("double")
    return (
        co.where(F.col("inter").cast("double") / union >= JACCARD_THRESHOLD)
        .select("a_id", "b_id")
    )


def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact-integer row: how much of the true near-dup pair set the
    banded MinHash index actually finds (and that it invents nothing)."""
    truth = _truth_pairs(spark, sf_dir).withColumn("in_t", F.lit(1))
    found = (
        q_dedup_minhash(spark, sf_dir)
        .select("a_id", "b_id")
        .withColumn("in_f", F.lit(1))
    )
    m = truth.join(found, ["a_id", "b_id"], "full_outer")
    both = (F.col("in_t") == 1) & (F.col("in_f") == 1)
    return m.agg(
        F.count("in_t").cast("bigint").alias("n_truth"),
        F.count("in_f").cast("bigint").alias("n_found"),
        F.sum(F.when(both, 1).otherwise(0)).cast("bigint").alias("n_common"),
        (F.count("in_t") - F.sum(F.when(both, 1).otherwise(0)))
        .cast("bigint")
        .alias("n_missed"),
        (F.count("in_f") - F.sum(F.when(both, 1).otherwise(0)))
        .cast("bigint")
        .alias("n_extra"),
    )


SQL_DEDUP_LSH_RECALL = f"""
WITH found AS ({SQL_DEDUP_MINHASH}),
{_SHINGLE_CTES}
truth AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM shing a JOIN shing b
      ON a.doc_id < b.doc_id
     AND CAST(LEAST(len(a.hs), len(b.hs)) AS DOUBLE)
         >= {JACCARD_THRESHOLD} * GREATEST(len(a.hs), len(b.hs))
    WHERE {_SQL_JACCARD.format(a='a.hs', b='b.hs')} >= {JACCARD_THRESHOLD}
),
m AS (
    SELECT (t.a_id IS NOT NULL) AS in_t,
           (f.a_id IS NOT NULL) AS in_f
    FROM truth t FULL OUTER JOIN found f
      ON t.a_id = f.a_id AND t.b_id = f.b_id
)
SELECT CAST(SUM(CASE WHEN in_t THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
       CAST(SUM(CASE WHEN in_f THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       CAST(SUM(CASE WHEN in_t AND in_f THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       CAST(SUM(CASE WHEN in_t AND NOT in_f THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
       CAST(SUM(CASE WHEN in_f AND NOT in_t THEN 1 ELSE 0 END) AS BIGINT) AS n_extra
FROM m
"""


QUERIES = {"q_dedup_lsh_recall": q_dedup_lsh_recall}
ORACLES = {"q_dedup_lsh_recall": SQL_DEDUP_LSH_RECALL}
