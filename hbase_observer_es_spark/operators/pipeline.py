"""The end-to-end corpus-cleaning pipeline: north-star operators COMPOSED.

Every stage exists as a standalone query (text quality/lang-ID in text.py, the
dedup family in dedup.py); this module chains them into the shape an actual
pre-training data pipeline runs — one declarative plan Catalyst optimizes as a
whole, not four jobs glued by intermediate tables:

    language filter → quality filter → exact dedup → SimHash near-dup dedup

Scale: the filters prune before anything expensive runs (predicate order is the
point of composing in one plan); exact dedup is one shuffle on text; SimHash is
one explode + one map-side-combined groupBy; the near-dup drop is a window over
the (small) per-fingerprint buckets. No stage widens rows it doesn't need —
`text` is dropped as soon as the last consumer (SimHash tokenization) is done.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from .dedup import SIMHASH_BITS, _rollhash, _SQL_ROLLHASH

LANG = "en"
MIN_TOKENS = 20
MIN_UNIQ_RATIO = 0.3


def q_pipeline_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → clean, deduplicated training corpus (doc_id, n_tokens, simhash).

    Keep-lowest-id at both dedup stages; thresholds are plain double compares on
    identically-computed ratios, so the survivor set is engine-exact.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("bigint")
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double")
    base = (
        d.filter(F.col("lang") == LANG)
        .select("doc_id", "text", n_tok.alias("n_tokens"), uniq_ratio.alias("ur"))
        .filter((F.col("n_tokens") >= MIN_TOKENS) & (F.col("ur") >= MIN_UNIQ_RATIO))
    )
    w_exact = Window.partitionBy("text").orderBy("doc_id")
    exact = (
        base.withColumn("rn", F.row_number().over(w_exact))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "n_tokens")
    )
    tok = exact.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    hashed = tok.select("doc_id", _rollhash(F.col("t")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    fps = agg.select("doc_id", fp.cast("bigint").alias("simhash"))
    w_near = Window.partitionBy("simhash").orderBy("doc_id")
    survivors = (
        fps.withColumn("rn", F.row_number().over(w_near))
        .filter(F.col("rn") == 1)
        .select("doc_id", "simhash")
    )
    return survivors.join(exact.select("doc_id", "n_tokens"), "doc_id").select(
        "doc_id", "n_tokens", "simhash"
    )


def _sql_pipeline() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH base AS (
    SELECT doc_id, text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ur
    FROM documents
    WHERE lang = '{LANG}'
),
filtered AS (
    SELECT doc_id, text, n_tokens FROM base
    WHERE n_tokens >= {MIN_TOKENS} AND ur >= {MIN_UNIQ_RATIO}
),
exact AS (
    SELECT doc_id, text, n_tokens FROM (
        SELECT doc_id, text, n_tokens,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM filtered
    ) WHERE rn = 1
),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM exact),
hashed AS (SELECT doc_id, {_SQL_ROLLHASH.format(tok='t')} AS h FROM tok WHERE t <> ''),
agg AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
fps AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM agg),
survivors AS (
    SELECT doc_id, simhash FROM (
        SELECT doc_id, simhash,
               row_number() OVER (PARTITION BY simhash ORDER BY doc_id) AS rn
        FROM fps
    ) WHERE rn = 1
)
SELECT s.doc_id, e.n_tokens, s.simhash
FROM survivors s JOIN exact e ON s.doc_id = e.doc_id
"""


SQL_PIPELINE_CORPUS = _sql_pipeline()


# --- deterministic stratified sampling (training-data mixture control) -------
#
# Pre-training pipelines downweight overrepresented strata (languages, sources)
# with per-stratum keep-rates. Random sampling is irreproducible and
# un-oracle-able; instead the keep decision is a pure integer-hash threshold:
#     keep  ⇔  (doc_id * HASH_MULT) % HASH_MOD  <  rate * HASH_MOD
# The Knuth multiplicative hash spreads sequential ids uniformly, the threshold
# is a precomputed integer, and BOTH engines run the identical arithmetic — the
# sample is exact, stable under re-runs/retries, and hash-verified. At 100 TB
# this is also the only sane sampling: no RNG state per task, no sampling drift
# across retries, and the filter is pure codegen'd column math on the scan.

HASH_MULT = 2654435761  # Knuth 2^32 / phi
HASH_MOD = 4294967296
SAMPLE_RATES = {"en": 0.25, "zh": 0.75}  # cap the overrepresented strata
SAMPLE_DEFAULT_RATE = 0.5


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling of the documents corpus."""
    h = (F.col("doc_id") * F.lit(HASH_MULT)) % F.lit(HASH_MOD)
    thr = None
    for lang, rate in sorted(SAMPLE_RATES.items()):
        t = F.lit(int(rate * HASH_MOD))
        cond = F.col("lang") == lang
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = thr.otherwise(F.lit(int(SAMPLE_DEFAULT_RATE * HASH_MOD)))
    d = table(spark, sf_dir, "documents")
    return d.filter(h < thr).select("doc_id", "lang", "source", "n_chars")


_SQL_THR = (
    "CASE lang "
    + " ".join(
        f"WHEN '{lang}' THEN {int(rate * HASH_MOD)}"
        for lang, rate in sorted(SAMPLE_RATES.items())
    )
    + f" ELSE {int(SAMPLE_DEFAULT_RATE * HASH_MOD)} END"
)

SQL_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (doc_id * {HASH_MULT}) % {HASH_MOD} < {_SQL_THR}
"""


QUERIES = {
    "q_pipeline_corpus": q_pipeline_corpus,
    "q_sample_stratified": q_sample_stratified,
}

ORACLES = {
    "q_pipeline_corpus": SQL_PIPELINE_CORPUS,
    "q_sample_stratified": SQL_SAMPLE_STRATIFIED,
}
