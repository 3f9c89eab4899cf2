"""Corpus-statistics operators for the training-data pipeline (north-star
family, not reference behavior — BASELINE.json's pipeline scope):

* q_text_ngram_rep    — Gopher-style top-bigram repetition fraction (the
                        n-gram sibling of text.py's top-WORD repetition);
* q_text_unigram      — corpus unigram familiarity score (two-pass CCNet-style
                        frequency scoring without a language model);
* q_text_boilerplate  — corpus-wide repeated-fragment fraction per document
                        (shared-shingle ratio, the template/header signal);
* q_text_pack_sharded — the PRODUCTION form of pipeline.py's q_text_pack:
                        sequence packing within a shard key, closing
                        DIVERGENCES.md D14's prose-only half.

Determinism: repetition, familiarity, and boilerplate are integer counts with
a single double division at the end (no float summation anywhere); packing is
integer window math — all four are hash-exact cross-engine by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import persist_tracked, table
from .dedup import _SQL_ROLLHASH, _SQL_SHINGLE_HASHES, _shingled_docs
from .pipeline import PACK_CAPACITY


def _toks():
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def q_text_ngram_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-bigram repetition: per document, the fraction of bigram slots
    covered by the single most frequent word bigram — the Gopher repetition
    filter one n up from q_text_topword (boilerplate and keyword-stuffed
    pages score high).

    Entirely map-only: bigrams, their per-row counts, and the max all come
    from higher-order array functions over the tokenization — no explode, no
    shuffle, the filter-shaped plan a 100 TB quality pass needs. The max
    multiplicity is a SORTED-RUN fold — sort the bigram array, fold once
    tracking (prev, run, best) — O(n log n) per row; the naive
    O(distinct·n) filter-count form measured ~1.7× slower at sf0.1 (1.57 s
    vs ~0.9 s warm) and degrades quadratically on long documents. The
    oracle keeps the naive form (DuckDB's list_reduce cannot carry a struct
    accumulator) — different algorithm, identical maximum.
    """
    d = table(spark, sf_dir, "documents")
    # Filter to >=2 tokens BEFORE building bigrams: F.slice with length
    # size(tk)-1 = -1 throws at runtime on a zero-token document, and the
    # oracle's WHERE len(tk) >= 2 already draws this boundary — mirror it
    # (a later filter on the bigram array would run after the throw).
    toks = d.select("doc_id", _toks().alias("tk")).filter(F.size("tk") >= 2)
    tk = F.col("tk")
    bg = F.zip_with(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    run1 = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))  # noqa: E731
    top = F.aggregate(
        F.array_sort(F.col("bg")),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run1(acc, x).alias("run"),
            F.greatest(acc["best"], run1(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    ).cast("bigint")
    return (
        toks.select("doc_id", bg.alias("bg"))
        .select(
            "doc_id",
            F.size("bg").cast("bigint").alias("n_bigrams"),
            top.alias("top_count"),
            (top.cast("double") / F.size("bg").cast("double")).alias("rep_frac"),
        )
    )


SQL_TEXT_NGRAM_REP = """
WITH t AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
    FROM documents
),
b AS (
    SELECT doc_id,
           list_transform(generate_series(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i + 1]) AS bg
    FROM t
    WHERE len(tk) >= 2
)
SELECT doc_id,
       CAST(len(bg) AS BIGINT) AS n_bigrams,
       CAST(list_max(list_transform(list_distinct(bg),
                     u -> len(list_filter(bg, x -> x = u)))) AS BIGINT) AS top_count,
       CAST(list_max(list_transform(list_distinct(bg),
                     u -> len(list_filter(bg, x -> x = u)))) AS DOUBLE)
           / CAST(len(bg) AS DOUBLE) AS rep_frac
FROM b
"""


def q_text_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram familiarity score: mean corpus frequency of a document's
    tokens — the model-free stand-in for CCNet/KenLM perplexity filtering
    (rare-token-heavy documents score low, boilerplate scores high). True
    perplexity needs log-probabilities (libm — the D10/D12 rule), so the
    score stays in exact integer space: sum of per-token corpus counts,
    divided once in double.

    Two passes, both shuffle-light: (1) token → corpus count (one
    map-side-combined groupBy over exploded tokens); (2) tokens re-joined to
    that frequency table — broadcast here (closed 31-token vocab), and still
    a broadcast at 100 TB for any vocabulary that fits executor memory
    (hundreds of MB); past that it becomes a bucketed equi-join on token.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks()).alias("t"))
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    return (
        tok.join(F.broadcast(vocab), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("c").alias("corpus_hits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "corpus_hits",
            (F.col("corpus_hits").cast("double") / F.col("n_tokens").cast("double")).alias(
                "familiarity"
            ),
        )
    )


SQL_TEXT_UNIGRAM = """
WITH tok AS (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
    FROM documents
),
vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(c) AS BIGINT) AS corpus_hits,
       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS familiarity
FROM tok JOIN vocab USING (t)
GROUP BY doc_id
"""


def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction: the share of a document's trigram
    shingles that also occur in at least one OTHER place in the corpus — the
    RefinedWeb-style repeated-fragment signal (headers, footers, templates)
    that document-level dedup cannot see, distinct from q_decontaminate's
    asymmetric train-vs-eval containment.

    Reuses dedup's hoisted-token-hash shingling (dedup.py:256). Two shuffles,
    both keyed on the shingle hash: the corpus frequency groupBy, then the
    join back — co-partitioned, so the second shuffle moves only the
    (hash, df) pairs. Counts are exact integers with ONE final double
    division; shingle sets are per-doc distinct, so COUNT(*) per hash IS the
    document frequency. At 100 TB this is the same plan with the frequency
    table bucketed by hash — never broadcast (shingle cardinality is
    corpus-scale, unlike q_text_unigram's vocabulary). The exploded shingle
    frame feeds BOTH plan branches (frequency agg + join-back), so it is
    persist_tracked — the dedup.py multi-branch lesson.
    """
    sh = persist_tracked(
        _shingled_docs(spark, sf_dir).select("doc_id", F.explode("hs").alias("h")),
        "corpus_stats.boilerplate.sh",
    )
    freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    shared = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        sh.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            shared.cast("bigint").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("n_shingles")).alias(
                "shared_frac"
            ),
        )
    )


SQL_TEXT_BOILERPLATE = f"""
WITH toks AS (
    SELECT doc_id,
           list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
                          t -> {_SQL_ROLLHASH.format(tok='t')}) AS th
    FROM documents
),
sh AS (SELECT doc_id, unnest({_SQL_SHINGLE_HASHES.format(th='th')}) AS h FROM toks),
freq AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
           AS shared_frac
FROM sh JOIN freq USING (h)
GROUP BY doc_id
"""


PACK_SHARD = "lang"  # the natural shard key in the fixture corpus


def q_text_pack_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing WITHIN a shard key — the production form of
    q_text_pack (pipeline.py:337, DIVERGENCES.md D14). Same expression, but
    the running-token window partitions by shard, so the plan is one hash
    exchange on the shard key and N independent in-partition sorts — no
    global single-task sort anywhere.

    pack_id is per-shard (a (shard, pack_id) pair is the globally unique bin,
    exactly how packed shards ship to trainers); each shard wastes at most
    one partial bin at its tail, the packing-efficiency cost of sharding.
    At 100 TB the shard key is whatever balances writers (lang, source,
    doc_id ranges) — the window never needs more than one shard in one task.
    """
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select("doc_id", F.col(PACK_SHARD).alias("shard"), n_tok.alias("n_tokens")).select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(prev / PACK_CAPACITY).cast("bigint").alias("pack_id"),
        (prev % PACK_CAPACITY).cast("bigint").alias("pack_offset"),
    )


SQL_TEXT_PACK_SHARDED = f"""
WITH t AS (
    SELECT doc_id, {PACK_SHARD} AS shard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT doc_id, shard, n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {PACK_CAPACITY}) AS BIGINT) AS pack_id,
       CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            % {PACK_CAPACITY} AS BIGINT) AS pack_offset
FROM t
"""


QUERIES = {
    "q_text_ngram_rep": q_text_ngram_rep,
    "q_text_unigram": q_text_unigram,
    "q_text_boilerplate": q_text_boilerplate,
    "q_text_pack_sharded": q_text_pack_sharded,
}

ORACLES = {
    "q_text_ngram_rep": SQL_TEXT_NGRAM_REP,
    "q_text_unigram": SQL_TEXT_UNIGRAM,
    "q_text_boilerplate": SQL_TEXT_BOILERPLATE,
    "q_text_pack_sharded": SQL_TEXT_PACK_SHARDED,
}
