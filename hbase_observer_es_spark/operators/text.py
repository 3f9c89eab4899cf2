"""Text analysis for LLM-data pipelines over `documents` (north-star operators).

The reference's system answers full-text queries only after shipping docs to
Elasticsearch (README.md:3 in /root/reference); ES tokenizes and scores server-side.
Here tokenization and scoring are native columnar expressions — every operator is a
JVM-side higher-order function (split/transform/filter/aggregate), no Python UDFs, so
the hot path stays inside whole-stage codegen and scales linearly with executors.

Operators: term frequencies (ES terms-agg analogue), per-language stats, heuristic
language ID (stopword n-gram scoring), quality scoring (length/stopword/uniqueness
ratios), token counting (whitespace + regex token models), rolling-hash document
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fan_out, table

# Tiny public stopword seeds per language — enough for a deterministic heuristic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "en", "que"),
}

MOD = 1_000_000_007


def _tokens() -> Column:
    return F.split(F.col("text"), " ")


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 term frequencies — the ES `terms` aggregation, Spark-native.

    explode → groupBy(token) is a map-side-combinable count; the top-20 is a
    TakeOrdered over the (small) distinct-token space, not a global sort of rows.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


SQL_TEXT_TOKENS = """
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 20
"""


def q_text_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (doc counts, char volume, token volume)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(_tokens())).cast("bigint").alias("total_tokens"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


SQL_TEXT_LANG = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY lang
"""


def _stop_score(lang: str) -> Column:
    words = list(STOPWORDS[lang])
    return F.size(
        F.filter(_tokens(), lambda t: t.isin(*words))
    ).cast("bigint")


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit scoring with a fixed arg-max order.

    Deliberately simple and fully deterministic — the point is the shape (per-doc
    vectorized scoring + tie-broken argmax), which is how a real n-gram LID model
    runs at scale. A model-backed scorer would swap in as a pandas UDF."""
    # fan_out (r17 gate A/B: 0.53 -> 0.35 s median): spread the stopword scans
    d = fan_out(table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id",
        "lang",
        _stop_score("en").alias("s_en"),
        _stop_score("de").alias("s_de"),
        _stop_score("fr").alias("s_fr"),
        _stop_score("es").alias("s_es"),
    )
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")), "de")
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es")
    )
    return scored.withColumn("pred_lang", pred)


def _sql_stop_score(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({inlist}))) AS BIGINT)"
    )


SQL_TEXT_LANGID = f"""
SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM (
    SELECT doc_id, lang,
           {_sql_stop_score('en')} AS s_en,
           {_sql_stop_score('de')} AS s_de,
           {_sql_stop_score('fr')} AS s_fr,
           {_sql_stop_score('es')} AS s_es
    FROM documents
)
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, unique-token ratio, stopword ratio, mean token
    length — the standard pre-training corpus filters, as pure columnar math."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tok = F.size(toks).cast("bigint")
    n_uniq = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*list(STOPWORDS["en"])))
    ).cast("bigint")
    uniq_ratio = n_uniq.cast("double") / n_tok.cast("double")
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    mean_tok_len = (
        (F.col("n_chars").cast("double") - (n_tok.cast("double") - F.lit(1.0)))
        / n_tok.cast("double")
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        ((uniq_ratio * F.lit(0.6)) + (stop_ratio * F.lit(0.4))).alias("quality"),
    )


_SQL_NTOK = "CAST(len(string_split(text, ' ')) AS BIGINT)"
_SQL_NUNIQ = "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)"
_SQL_NSTOP = _sql_stop_score("en")

SQL_TEXT_QUALITY = f"""
SELECT doc_id,
       n_tokens, n_unique,
       uniq_ratio, stop_ratio,
       (CAST(n_chars AS DOUBLE) - (CAST(n_tokens AS DOUBLE) - 1.0))
           / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
       (uniq_ratio * 0.6) + (stop_ratio * 0.4) AS quality
FROM (
    SELECT doc_id, n_chars, n_tokens, n_unique, n_stop,
           CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_ratio,
           CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio
    FROM (
        SELECT doc_id, n_chars,
               {_SQL_NTOK} AS n_tokens,
               {_SQL_NUNIQ} AS n_unique,
               {_SQL_NSTOP} AS n_stop
        FROM documents
    )
)
"""


def q_text_tokcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under two tokenizer models: whitespace and a BPE-ish regex
    ([a-z]+ runs | digit runs | single other non-space) — regexp_count stays JVM-side."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).cast("bigint").alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("bigint")
        .alias("n_re_tokens"),
        F.length("text").cast("bigint").alias("n_chars_text"),
    )


SQL_TEXT_TOKCOUNT = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
           AS n_re_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_text
FROM documents
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash (base 31, mod 1e9+7) over the characters of each
    document — a deterministic content fingerprint computed as a higher-order fold,
    no UDF. Equal docs ⇒ equal fingerprints across engines and runs."""
    d = table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + c) % F.lit(MOD),
    )
    return d.select("doc_id", fp.alias("fingerprint"), F.md5("text").alias("md5_hex"))


SQL_TEXT_FINGERPRINT = f"""
SELECT doc_id,
       CAST(list_reduce(
           list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
           (acc, c) -> (acc * 31 + c) % {MOD}) AS BIGINT) AS fingerprint,
       md5(text) AS md5_hex
FROM documents
"""


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the step that turns documents into
    fixed-budget training samples (context windows) in an LLM data pipeline.

    Chunk starts are generated per row with `sequence` (1, 1+stride, … ≤ n_tokens)
    and exploded; each chunk is a `slice` of the SAME tokenization — the document
    text is split once, never re-scanned per chunk. All higher-order built-ins:
    the 1→N fan-out happens executor-side inside codegen, no UDF, no shuffle at
    all (chunk rows inherit the scan's partitioning). At 100 TB this is the
    shape that matters: output size is input size × overlap factor, and nothing
    global exists.
    """
    d = table(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    chunked = d.select(
        "doc_id",
        tk.alias("tk"),
        F.explode(F.sequence(F.lit(1), F.size(tk), F.lit(CHUNK_STRIDE))).alias("start"),
    ).filter(F.size("tk") >= 1)
    piece = F.slice(F.col("tk"), F.col("start"), CHUNK_TOKENS)
    return chunked.select(
        "doc_id",
        ((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.col("start").cast("bigint").alias("start"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


SQL_TEXT_CHUNK = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(s AS BIGINT) AS start,
       CAST(len(list_slice(tk, s, s + {CHUNK_TOKENS - 1})) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(tk, s, s + {CHUNK_TOKENS - 1}), ' ') AS chunk_text
FROM d, LATERAL unnest(generate_series(1, len(tk), {CHUNK_STRIDE})) AS t(s)
WHERE len(tk) >= 1
"""


TOPWORD_REP_FRAC = 0.10  # most-common-token share above this flags repetition


def q_text_topword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document most-frequent token and its share of all tokens — the
    repetition quality signal (Gopher-style "top word fraction") used to drop
    degenerate/templated documents from training corpora.

    explode → (doc, token) counts (map-side combinable), then ONE window over
    doc_id ranks tokens (count desc, token asc) and sums the doc total in the
    same pass — the groupBy and the window share the doc_id-prefixed key, so
    AQE plans them over one exchange. top_frac is a single IEEE division,
    deterministic cross-engine.
    """
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wdoc = Window.partitionBy("doc_id")
    wrank = wdoc.orderBy(F.desc("n"), F.asc("token"))
    frac = F.col("n").cast("double") / F.col("total")
    return (
        counts.withColumn("rnk", F.row_number().over(wrank))
        .withColumn("total", F.sum("n").over(wdoc))
        .filter(F.col("rnk") == 1)
        .select(
            "doc_id",
            F.col("token").alias("top_token"),
            F.col("n").alias("top_count"),
            F.col("total").alias("n_tokens"),
            frac.alias("top_frac"),
            (frac > TOPWORD_REP_FRAC).alias("repetitive"),
        )
    )


SQL_TEXT_TOPWORD = f"""
WITH counts AS (
    SELECT doc_id, token, COUNT(*) AS n FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ) WHERE token <> ''
    GROUP BY doc_id, token
), ranked AS (
    SELECT doc_id, token, n,
           row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, token ASC) AS rnk,
           CAST(SUM(n) OVER (PARTITION BY doc_id) AS BIGINT) AS total
    FROM counts
)
SELECT doc_id, token AS top_token, n AS top_count, total AS n_tokens,
       CAST(n AS DOUBLE) / total AS top_frac,
       CAST(n AS DOUBLE) / total > {TOPWORD_REP_FRAC} AS repetitive
FROM ranked WHERE rnk = 1
"""


def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram-token ENTROPY proxy in exact integer bits —
    the diversity/repetitiveness quality signal (a gibberish or
    boilerplate page has low token entropy; CCNet/Gopher gate on the
    float form). D10 discipline: true entropy is libm territory, but
    the floor-log2 decomposition

        ent_bits_floor = N·⌊log2 N⌋ − Σ_w c_w·⌊log2 c_w⌋
                       = Σ_w c_w·(⌊log2 N⌋ − ⌊log2 c_w⌋)

    is pure integer arithmetic (``⌊log2 x⌋ = length(bin(x)) − 1`` in
    BOTH engines — the q_lm_surprisal trick), same ordering for gating.
    Tokenizer: the corpus convention (split on space, drop empties).

    Scale: one explode + two map-side-combinable aggregations keyed by
    doc_id (never a global shuffle key), and a doc_id equi-join back to
    documents so empty docs keep a zero row. REGISTERED round 15."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    bits = lambda c: F.length(F.bin(c)) - 1  # floor(log2 x), exactly
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    per = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_unique"),
        F.sum(F.col("c") * bits(F.col("c"))).alias("s"),
    )
    return (
        d.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.coalesce(
                F.col("n_tokens") * bits(F.col("n_tokens")) - F.col("s"),
                F.lit(0),
            ).cast("long").alias("ent_bits_floor"),
        )
    )


SQL_TEXT_ENTROPY = """
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split(coalesce(text, ''), ' '),
                              x -> x <> '')) AS tok
    FROM documents
),
counts AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
per AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(c * (length(bin(c)) - 1)) AS BIGINT) AS s
    FROM counts GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_unique, 0) AS BIGINT) AS n_unique,
       CAST(coalesce(
           p.n_tokens * (length(bin(p.n_tokens)) - 1) - p.s, 0
       ) AS BIGINT) AS ent_bits_floor
FROM documents d LEFT JOIN per p USING (doc_id)
"""


QUERIES = {
    "q_text_tokens": q_text_tokens,
    "q_text_entropy": q_text_entropy,
    "q_text_lang": q_text_lang,
    "q_text_langid": q_text_langid,
    "q_text_quality": q_text_quality,
    "q_text_tokcount": q_text_tokcount,
    "q_text_fingerprint": q_text_fingerprint,
    "q_text_chunk": q_text_chunk,
    "q_text_topword": q_text_topword,
}

ORACLES = {
    "q_text_tokens": SQL_TEXT_TOKENS,
    "q_text_entropy": SQL_TEXT_ENTROPY,
    "q_text_lang": SQL_TEXT_LANG,
    "q_text_langid": SQL_TEXT_LANGID,
    "q_text_quality": SQL_TEXT_QUALITY,
    "q_text_tokcount": SQL_TEXT_TOKCOUNT,
    "q_text_fingerprint": SQL_TEXT_FINGERPRINT,
    "q_text_chunk": SQL_TEXT_CHUNK,
    "q_text_topword": SQL_TEXT_TOPWORD,
}
