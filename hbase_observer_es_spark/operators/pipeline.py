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

from ..io import fan_out, table
from .dedup import SIMHASH_BITS, _rollhash, _SQL_ROLLHASH
from .text import MOD

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


# --- benchmark decontamination (train-vs-eval n-gram collision) --------------
#
# Distinct from the dedup family: dedup asks "is this document a copy of ANOTHER
# TRAINING document"; decontamination asks "does this training document contain
# an n-gram that also appears in the EVALUATION set" — an asymmetric containment
# check against a small reference corpus, the step every pre-training pipeline
# runs before export so benchmark answers don't leak into the training data.
#
# Scale shape: the eval side is a benchmark suite — thousands of documents, MBs
# — so its distinct shingle-hash set is broadcast; the train side (the 100 TB)
# is scanned once, sharded shingles stream map-side into a broadcast hash join,
# and only colliding (doc, shingle) rows reach the final doc-level aggregate.
# No shuffle touches the full corpus' shingles.
#
# DECON_N: production decontamination uses 8–13-gram windows; fixture texts are
# ~16 words, so 4-grams are the fixture-scale equivalent (same plan, shorter
# window). Shingles are hashed with the same rolling-hash fold as the dedup
# family — a hash-only join admits ~|pairs|/2^63 false collisions, which for
# contamination is the conservative direction (quarantine, never leak).

DECON_N = 4
DECON_EVAL_SRC = "src0"


def _decon_shingles(df: DataFrame) -> DataFrame:
    """(doc_id, source, h): exploded distinct word-``DECON_N``-gram hashes.

    Same hoisted token-hash + windowed integer fold as dedup's `_shingled_docs`
    (dedup.py:256), parameterized to the decontamination window.
    """
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    th_df = df.select("doc_id", "source", F.transform(toks, _rollhash).alias("th"))
    th = F.col("th")
    idx = F.sequence(F.lit(1), F.greatest(F.size(th) - (DECON_N - 1), F.lit(1)))
    shingle = F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(th, i, DECON_N),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * F.lit(31) + x) % F.lit(MOD),
        ),
    )
    return th_df.select(
        "doc_id", "source", F.explode(F.array_distinct(shingle)).alias("h")
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by the eval slice (`source = 'src0'`): per
    contaminated doc, how many distinct eval docs and distinct shingles collide.
    """
    # fan_out (r17 gate A/B: 1.21 -> 0.91 s median): spread the shingle build
    sh = _decon_shingles(fan_out(table(spark, sf_dir, "documents")))
    ev = (
        sh.filter(F.col("source") == DECON_EVAL_SRC)
        .select("h", F.col("doc_id").alias("eval_id"))
    )
    tr = sh.filter(F.col("source") != DECON_EVAL_SRC)
    return (
        tr.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").alias("n_eval_docs"),
            F.countDistinct("h").alias("n_shingles"),
        )
    )


# list_reduce has no init arg but f(h1, h2) == fold-from-0 since 0*31 + h1 = h1
SQL_DECONTAMINATE = f"""
WITH toks AS (
    SELECT doc_id, source,
           list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
                          t -> {_SQL_ROLLHASH.format(tok='t')}) AS th
    FROM documents
),
sh AS (
    SELECT doc_id, source,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(th) - {DECON_N - 1}, 1)),
               i -> list_reduce(th[i:i+{DECON_N - 1}],
                                (acc, x) -> (acc * 31 + x) % {MOD})))) AS h
    FROM toks
),
ev AS (SELECT DISTINCT h, doc_id AS eval_id FROM sh WHERE source = '{DECON_EVAL_SRC}'),
tr AS (SELECT doc_id, h FROM sh WHERE source <> '{DECON_EVAL_SRC}')
SELECT tr.doc_id AS doc_id,
       COUNT(DISTINCT eval_id) AS n_eval_docs,
       COUNT(DISTINCT tr.h) AS n_shingles
FROM tr JOIN ev ON tr.h = ev.h
GROUP BY tr.doc_id
"""


# Mixture temperature: share^τ with τ=0.5 — i.e. sqrt, the one power IEEE
# guarantees exactly-rounded in both engines (pow(x, 0.5) is NOT sqrt in
# general and libm pow is engine-divergent; sqrt is safe).
PACK_CAPACITY = 512  # tokens per packed training sequence


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixture reweighting (τ = 0.5): per-language
    sampling weights w_l ∝ share_l^τ — the standard move that upsamples
    low-resource slices when assembling a multilingual training mix.

    Two tiny aggregates over one scan: per-language token counts (map-side
    combined), the τ-tempered share, and its normalization. The normalizer is a
    1-row frame joined back by broadcast — language cardinality work, no second
    pass over the corpus. sqrt keeps the tempering bit-identical cross-engine.
    """
    d = table(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("n_tokens"),
    )
    # temp_norm sums IRRATIONAL doubles (sqrt outputs) — a plain SUM's
    # association order differs between engines, so fold the values in a fixed
    # (lang-sorted) order instead: collect the language-cardinality list, sort,
    # left-fold. Same trick as search.py's MLT sorted-idf fold.
    sqrt_tok = F.sqrt(F.col("n_tokens").cast("double"))
    sorted_sqrts = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("lang"), sqrt_tok.alias("s")))),
        lambda p: p["s"],
    )
    tot = per_lang.agg(
        F.sum("n_tokens").alias("tok_total"),
        F.aggregate(sorted_sqrts, F.lit(0.0), lambda acc, x: acc + x).alias("temp_norm"),
    )
    share = F.col("n_tokens").cast("double") / F.col("tok_total")
    tempered = F.sqrt(F.col("n_tokens").cast("double")) / F.col("temp_norm")
    return (
        per_lang.join(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            share.alias("share"),
            tempered.alias("weight"),
            (tempered / share).alias("upsample_factor"),
        )
    )


SQL_MIXTURE_WEIGHTS = """
WITH per_lang AS (
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
), tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS tok_total,
           list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY lang)),
               (acc, x) -> acc + x) AS temp_norm
    FROM per_lang
)
SELECT lang, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / tok_total AS share,
       sqrt(CAST(n_tokens AS DOUBLE)) / temp_norm AS weight,
       (sqrt(CAST(n_tokens AS DOUBLE)) / temp_norm)
           / (CAST(n_tokens AS DOUBLE) / tok_total) AS upsample_factor
FROM per_lang, tot
"""


def q_text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential sequence packing: assign documents (in doc_id order) to
    fixed-capacity training bins by running token count — the concat-and-split
    packing used to fill context windows without padding waste.

    pack_id = floor(preceding-cumulative-tokens / capacity): one ordered window
    over the corpus. Deterministic (integer math over an exact cumsum) and
    oracle-exact. The global order is the fixture-scale shortcut; at 100 TB you
    run the SAME expression partitioned by shard key (pack within shard) so the
    window never needs a global sort — noted rather than hidden.
    """
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        d.select("doc_id", n_tok.alias("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            F.floor(prev / PACK_CAPACITY).cast("bigint").alias("pack_id"),
            (prev % PACK_CAPACITY).cast("bigint").alias("pack_offset"),
        )
    )


SQL_TEXT_PACK = f"""
WITH t AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT doc_id, n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {PACK_CAPACITY}) AS BIGINT) AS pack_id,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            % {PACK_CAPACITY} AS BIGINT) AS pack_offset
FROM t
"""


DIV_MAX_PER_VALUE = 40  # diversified_sampler: max docs per field value (lang)
DIV_SAMPLE_N = 120  # overall sample size after the diversity cap
DIV_SEED_MULT = 2654435761
DIV_SEED_MOD = 1_000_000_007


def q_sample_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `diversified_sampler` aggregation: a sample capped at
    max_docs_per_value per field value (lang) — the per-domain cap that stops
    one slice from flooding a training sample — then cut to the overall sample
    size. Deterministic throughout: "random" order is the Knuth-hash rank of
    doc_id (no RNG, retry-stable, same discipline as q_sample_stratified).

    Two windows over the same hash order: per-lang row_number applies the
    diversity cap (one shuffle by lang), then a global TakeOrdered-shaped cut
    picks the sample. The global cut ranks ≤ |langs|·cap rows — cap-bounded,
    never corpus-bounded, so the single-partition tail window is safe at any
    scale.
    """
    d = table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * DIV_SEED_MULT) % DIV_SEED_MOD
    w_lang = Window.partitionBy("lang").orderBy("h", "doc_id")
    capped = (
        d.select("doc_id", "lang", h.alias("h"))
        .withColumn("lang_rank", F.row_number().over(w_lang))
        .filter(F.col("lang_rank") <= DIV_MAX_PER_VALUE)
    )
    return (
        capped.orderBy("h", "doc_id")
        .limit(DIV_SAMPLE_N)
        .select("doc_id", "lang", F.col("lang_rank").cast("bigint").alias("lang_rank"))
    )


SQL_SAMPLE_DIVERSIFIED = f"""
WITH hashed AS (
    SELECT doc_id, lang, (doc_id * {DIV_SEED_MULT}) % {DIV_SEED_MOD} AS h
    FROM documents
), capped AS (
    SELECT doc_id, lang, h,
           row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS lang_rank
    FROM hashed
)
SELECT doc_id, lang, CAST(lang_rank AS BIGINT) AS lang_rank
FROM capped
WHERE lang_rank <= {DIV_MAX_PER_VALUE}
ORDER BY h, doc_id
LIMIT {DIV_SAMPLE_N}
"""


QUERIES = {
    "q_pipeline_corpus": q_pipeline_corpus,
    "q_sample_stratified": q_sample_stratified,
    "q_decontaminate": q_decontaminate,
    "q_mixture_weights": q_mixture_weights,
    "q_text_pack": q_text_pack,
    "q_sample_diversified": q_sample_diversified,
}

ORACLES = {
    "q_pipeline_corpus": SQL_PIPELINE_CORPUS,
    "q_sample_stratified": SQL_SAMPLE_STRATIFIED,
    "q_decontaminate": SQL_DECONTAMINATE,
    "q_mixture_weights": SQL_MIXTURE_WEIGHTS,
    "q_text_pack": SQL_TEXT_PACK,
    "q_sample_diversified": SQL_SAMPLE_DIVERSIFIED,
}
