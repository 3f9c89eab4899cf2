"""Exact substring-span dedup over `documents` — the repeated-n-gram pass.

The one member of the dedup family the engine lacked: finding EXACT repeated
token spans *within and across* documents (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" — their suffix-array ExactSubstr
pass), as opposed to whole-document dedup (q_dedup_exact) or whole-document
near-dup (q_dedup_minhash / q_dedup_simhash). Training pipelines run BOTH:
document-level dedup misses boilerplate spans shared by otherwise-distinct
pages (licence blocks, navigation chrome, templated intros), which are what
the span pass removes or down-weights.

Spark-first shape — NO suffix array. Lee et al. build a single-node suffix
array over the concatenated corpus; that structure does not distribute. The
equivalent distributed formulation is shingle-and-count: every K-token span
(K = 8 here, their 50-token window scaled to the fixture's short synthetic
docs) becomes a row, and a span is "duplicated" iff it occurs >= 2 times in
the whole corpus. That is ONE shuffle on the span key (window count), then
one aggregation back to doc grain — both linear, both skew-tolerant (a
pathologically hot span is one window partition; AQE splits it).

100 TB notes, at the expression to change:
  * group on xxhash64(span) instead of the span STRING to keep the exchange
    key 8 bytes (collision odds ~n^2/2^64 — the standard trade; the string
    key here keeps the DuckDB oracle byte-exact).
  * K=50 for real web text per Lee et al.; K is a literal below.
  * the per-doc aggregation reuses the same exchange when
    spark.sql.shuffle.partitions hash-aligns doc_id — no extra stage beyond
    the two inherent ones.

Both queries are UDF-free: spans are built with split/sequence/transform/
slice/array_join inside whole-stage codegen, never in Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fan_out, table

K_SPAN = 8  # tokens per span; Lee et al. use 50 on real web text


def _spans() -> Column:
    """All K-token spans of `text`, in order, as space-joined strings.

    `F.sequence(1, n)` is DESCENDING when n < 1 (sequence(1, 0) == [1, 0]),
    so short docs guard through `when` to an empty array, not through
    sequence itself."""
    t = F.split(F.col("text"), " ")
    n = F.size(t) - F.lit(K_SPAN - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(t, i, K_SPAN), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: of a doc's K-token spans, how
    many also occur elsewhere in the corpus (counting a second occurrence in
    the SAME doc — self-repetition is duplication too, per ExactSubstr).

    Docs shorter than K tokens surface with zero spans (explode_outer keeps
    them as a NULL span row; the NULL never counts as a duplicate)."""
    # fan_out: the span explosion is the query's compute; over the sub-split
    # fixture scan it ran in ONE task (r17: 2.0 -> 0.79 s with the spread)
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    # materialize the span array ONCE: naming it in a prior projection lets
    # both consumers (size and the Generate) share the expression — inlining
    # _spans() twice would re-tokenize and re-join every window per row
    ex = d.withColumn("spans", _spans()).select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        F.explode_outer("spans").alias("span"),
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("span"))
    dup = F.col("span").isNotNull() & (cnt >= 2)
    return (
        ex.withColumn("is_dup", dup)
        .groupBy("doc_id", "n_spans")
        .agg(F.count(F.when(F.col("is_dup"), 1)).alias("n_dup_spans"))
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            F.when(
                F.col("n_spans") > 0,
                F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


# THE one span-generation SQL — every oracle that shingles documents
# (per-doc coverage, the top view, graph.py's span-sharing components)
# builds on this same string, so a fix to tokenization or the slice
# arithmetic cannot silently diverge between them. `spans` is the
# (doc_id, span) relation; zero-span docs are absent from it (inner
# LATERAL) — consumers that must surface them re-derive counts from
# `toks`.
SQL_SPANS_CTE = f"""toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
spans AS (
    SELECT doc_id, array_to_string(t[i:i + {K_SPAN} - 1], ' ') AS span
    FROM toks, LATERAL
        unnest(range(1, greatest(len(t) - {K_SPAN} + 1, 0) + 1)) AS u(i)
)"""


SQL_DEDUP_SUBSTRING = f"""
WITH {SQL_SPANS_CTE},
nsp AS (
    SELECT doc_id,
           CAST(greatest(len(t) - {K_SPAN} + 1, 0) AS BIGINT) AS n_spans
    FROM toks
),
perdoc AS (
    SELECT doc_id, count(*) FILTER (c >= 2) AS n_dup
    FROM (
        SELECT doc_id, count(*) OVER (PARTITION BY span) AS c FROM spans
    )
    GROUP BY doc_id
)
SELECT n.doc_id, n.n_spans,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
       CASE WHEN n.n_spans > 0
            THEN CAST(COALESCE(p.n_dup, 0) AS DOUBLE)
                 / CAST(n.n_spans AS DOUBLE)
            ELSE 0.0 END AS dup_frac
FROM nsp n LEFT JOIN perdoc p USING (doc_id)
"""


def q_dedup_substring_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repeated spans themselves: every K-token span occurring >= 2 times,
    top-20 by total occurrences with a TOTAL ordering (count desc, span asc —
    ties cannot make the cut nondeterministic). This is the triage view a
    pipeline operator reads before choosing what to strip: the head of this
    list IS the boilerplate."""
    # fan_out: same serial-scan spread as q_dedup_substring (2.2 -> 0.77 s)
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    return (
        d.select("doc_id", F.explode(_spans()).alias("span"))
        .groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occ") >= 2)
        .orderBy(F.col("n_occ").desc(), "span")
        .limit(20)
    )


SQL_DEDUP_SUBSTRING_TOP = f"""
WITH {SQL_SPANS_CTE}
SELECT span,
       CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM spans
GROUP BY span
HAVING count(*) >= 2
ORDER BY n_occ DESC, span
LIMIT 20
"""


QUERIES = {
    "q_dedup_substring": q_dedup_substring,
    "q_dedup_substring_top": q_dedup_substring_top,
}

ORACLES = {
    "q_dedup_substring": SQL_DEDUP_SUBSTRING,
    "q_dedup_substring_top": SQL_DEDUP_SUBSTRING_TOP,
}
