"""Deterministic dataset splitting and composed quality gating — two more
LLM-data-pipeline staples (no reference analogue: the reference is CDC glue;
this is the pipeline family mandated alongside SURVEY.md §2).

* q_split_assign — reproducible train/valid/test assignment by integer hash:
  the split every training run must agree on across reruns, engines, and
  cluster sizes (RNG-free — the q_sample_stratified discipline, same Knuth
  multiplier, documented id-range invariant).
* q_text_gopher — a composed Gopher-style quality gate (Rae et al. 2021,
  public): several per-document heuristics evaluated in ONE projection with
  a bitmask of failed rules, so downstream can both filter and audit WHY
  documents fell out.

Determinism: integer hash arithmetic and integer/rational ratios only; the
single float comparison per rule uses exact IEEE division both engines share.

Scale: both are map-only over the scan plus one map-side-combined groupBy for
the report frame — zero joins, zero windows; the split column is computed,
never stored state, so it holds for any shard of a 100 TB corpus
independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

HASH_MULT = 2654435761  # Knuth 2^32/phi (q_sample_stratified's constant)
HASH_MOD = 4294967296
VALID_PCT = 5  # % of corpus to valid
TEST_PCT = 5  # % of corpus to test

# Gopher-style rule thresholds (public heuristics; tuned to fixture ranges so
# every rule actually fires on part of the corpus — a gate that passes 100%
# verifies nothing)
G_MIN_TOKENS = 30
G_MAX_TOKENS = 90
G_MIN_MEAN_TOK_LEN = 4.1
G_MAX_MEAN_TOK_LEN = 4.9
G_MIN_UNIQ_RATIO = 0.33


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to train/valid/test by hash bucket and report the
    per-source × split composition (doc and char counts) — the audit frame a
    pipeline publishes so downstream consumers can verify split integrity.

    bucket = (doc_id · Knuth) mod 2^32, scaled to percent; [0, VALID_PCT) →
    valid, [VALID_PCT, VALID_PCT+TEST_PCT) → test, rest → train. Assignment
    is a pure function of the id: stable under reruns, re-partitioning, and
    corpus growth (a new doc never moves an old one).
    """
    d = table(spark, sf_dir, "documents")
    pct = ((F.col("doc_id") * F.lit(HASH_MULT)) % F.lit(HASH_MOD)) * F.lit(
        100
    ) / F.lit(HASH_MOD)
    split = (
        F.when(pct < VALID_PCT, F.lit("valid"))
        .when(pct < VALID_PCT + TEST_PCT, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return (
        d.select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


SQL_SPLIT_ASSIGN = f"""
WITH assigned AS (
    SELECT source, n_chars,
           CASE
             WHEN (doc_id * {HASH_MULT}) % {HASH_MOD} * 100 / {HASH_MOD}
                  < {VALID_PCT} THEN 'valid'
             WHEN (doc_id * {HASH_MULT}) % {HASH_MOD} * 100 / {HASH_MOD}
                  < {VALID_PCT + TEST_PCT} THEN 'test'
             ELSE 'train'
           END AS split
    FROM documents
)
SELECT source, split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM assigned
GROUP BY source, split
"""


def q_text_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed Gopher-style quality gate: evaluate all rules in one
    projection, emit per-document pass/fail plus a rule bitmask, and reduce
    to the per-lang audit (docs kept, docs dropped, per-rule failure counts).

    Rules (bit: meaning): 1: token count < {G_MIN_TOKENS}; 2: token count >
    {G_MAX_TOKENS}; 4: mean token length outside [{G_MIN_MEAN_TOK_LEN},
    {G_MAX_MEAN_TOK_LEN}]; 8: unique-token ratio < {G_MIN_UNIQ_RATIO}.
    The bitmask (integer OR of failed rules) is what a production pipeline
    logs — filtering without attribution is undebuggable at 100 TB.

    Zero-token documents: the ratio rules (bits 4, 8) are undefined at
    n_tok = 0, so both engines gate them behind n_tok > 0 (such a document
    still fails bit 1). The divisions live INSIDE the guarded `when` branch —
    SQL `AND` does not short-circuit, and under Spark's ANSI mode an
    unguarded x/0 is a runtime error, not Inf; the NULL ratio then makes the
    comparison falsey on both engines.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n_tok = F.size(toks).cast("bigint")
    n_uniq = F.size(F.array_distinct(toks)).cast("bigint")
    # mean token length from n_chars: tokens plus (n_tok-1) separators;
    # NULL (not an error) for zero-token docs
    mean_len = F.when(
        n_tok > 0,
        (F.col("n_chars").cast("double") - (n_tok.cast("double") - F.lit(1.0)))
        / n_tok.cast("double"),
    )
    uniq_ratio = F.when(n_tok > 0, n_uniq.cast("double") / n_tok.cast("double"))
    mask = (
        F.when(n_tok < G_MIN_TOKENS, F.lit(1)).otherwise(F.lit(0))
        + F.when(n_tok > G_MAX_TOKENS, F.lit(2)).otherwise(F.lit(0))
        + F.when(
            (mean_len < G_MIN_MEAN_TOK_LEN) | (mean_len > G_MAX_MEAN_TOK_LEN),
            F.lit(4),
        ).otherwise(F.lit(0))
        + F.when(uniq_ratio < G_MIN_UNIQ_RATIO, F.lit(8)).otherwise(F.lit(0))
    )
    per_doc = d.select("lang", mask.cast("int").alias("mask"))

    def fails(bit: int, alias: str) -> Column:
        return (
            F.sum((F.col("mask").bitwiseAND(bit) > 0).cast("bigint"))
            .cast("bigint")
            .alias(alias)
        )

    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("mask") == 0).cast("bigint")).cast("bigint").alias("kept"),
        fails(1, "fail_min_tokens"),
        fails(2, "fail_max_tokens"),
        fails(4, "fail_mean_len"),
        fails(8, "fail_uniq"),
    )


SQL_TEXT_GOPHER = f"""
WITH scored AS (
    SELECT lang,
           CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                AS BIGINT) AS n_tok,
           CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                              t -> t <> ''))) AS BIGINT)
               AS n_uniq,
           n_chars
    FROM documents
),
masked AS (
    SELECT lang,
           (CASE WHEN n_tok < {G_MIN_TOKENS} THEN 1 ELSE 0 END)
           + (CASE WHEN n_tok > {G_MAX_TOKENS} THEN 2 ELSE 0 END)
           + (CASE WHEN n_tok > 0
                    AND ((CAST(n_chars AS DOUBLE) - (CAST(n_tok AS DOUBLE) - 1.0))
                         / CAST(n_tok AS DOUBLE) < {G_MIN_MEAN_TOK_LEN}
                      OR (CAST(n_chars AS DOUBLE) - (CAST(n_tok AS DOUBLE) - 1.0))
                         / CAST(n_tok AS DOUBLE) > {G_MAX_MEAN_TOK_LEN})
                   THEN 4 ELSE 0 END)
           + (CASE WHEN n_tok > 0
                    AND CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE)
                        < {G_MIN_UNIQ_RATIO} THEN 8 ELSE 0 END) AS mask
    FROM scored
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN mask = 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(SUM(CASE WHEN mask & 1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS fail_min_tokens,
       CAST(SUM(CASE WHEN mask & 2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS fail_max_tokens,
       CAST(SUM(CASE WHEN mask & 4 > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS fail_mean_len,
       CAST(SUM(CASE WHEN mask & 8 > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS fail_uniq
FROM masked
GROUP BY lang
"""


QUERIES = {
    "q_split_assign": q_split_assign,
    "q_text_gopher": q_text_gopher,
}

ORACLES = {
    "q_split_assign": SQL_SPLIT_ASSIGN,
    "q_text_gopher": SQL_TEXT_GOPHER,
}
