"""Corpus drift: exact distribution-shift measurement between two corpora.

A training-data pipeline re-cuts its corpus constantly — a new crawl lands,
a dedup pass runs, a mixture weight changes — and the question after every
cut is "how different is the text DISTRIBUTION now?". The standard lenses
(KL divergence, perplexity deltas) live in log-space, which is libm
territory (the D10/D12 rule: no transcendental outputs in oracle-checked
columns). Total-variation distance doesn't: with unigram counts ``c_a``
over ``N_a`` total tokens (resp. ``c_b``/``N_b``),

    TV = 1/2 · Σ_t |c_a(t)/N_a − c_b(t)/N_b|
       = Σ_t |c_a(t)·N_b − c_b(t)·N_a|  ÷  (2·N_a·N_b)

— the numerator is pure INTEGER arithmetic, exact in any engine, and the
same per-term quantity ``|c_a·N_b − c_b·N_a|`` ranks the terms that drive
the drift (signed, it says which side gained). Everything oracle-visible
stays in DECIMAL integer space; callers do the one division themselves.

Overflow discipline: counts and totals cast to DECIMAL(18,0) (covers
N ≤ 10^18 tokens — two orders past a 100 TB corpus), products are
DECIMAL(37,0), the summed numerator DECIMAL(38,0) — bounded by
2·N_a·N_b < 2·10^36, inside 38 digits. No silent wraparound anywhere.

Tokenization is the corpus convention (``corpus_stats``/``text``): split
on single space, drop empties — byte-identical in Spark and DuckDB.

Scale shape: two map-side-combined ``groupBy(term)`` counts (one per
corpus — vocabulary-sized outputs, sub-linear in corpus size by Heaps'
law, and each corpus is scanned exactly ONCE), a full-outer equi-join of
the two VOCAB tables on term (never the corpora), and totals as global
window sums over the vocab-sized join output. The top-k cut is a
``row_number`` over one global ordering of the same vocab-sized frame —
at real scale swap to an ORDER-BY-LIMIT (TakeOrdered) on the score.
Empty corpora fail loudly (see ``_joined_counts``).

REGISTERED round 14 (held since r11 for window headroom, the
classifier/profile convention): ``q_corpus_drift`` (top-k drift terms,
en-vs-fr slices of documents) and ``q_corpus_drift_tv`` (the exact TV
numerator/denominator), DuckDB-hash-checked in ``tests/test_drift.py``.
The round-14 DRIVER check came back hash-red with rows/schema green and
every cell value-exact: these were the only registered queries emitting
raw DECIMAL top-level columns, and the driver's pandas canonicalizer
renders DuckDB DECIMAL as float64 while Spark keeps ``Decimal`` objects
— the same coercion class as the HUGEINT trap. Round-15 fix: the
REGISTERED projections (``q_corpus_drift``/``q_corpus_drift_tv`` and
their oracle SQL) cast every DECIMAL output to BIGINT through a loud
overflow guard (values fit bigint with ~4 orders of headroom at sf0.1;
internal math stays DECIMAL-exact). The library functions
(``unigram_drift``/``drift_summary``) keep their exact DECIMAL outputs
for 100 TB callers. The oracle harness now rejects any top-level
DECIMAL output so the class is unrepresentable (``oracle_harness.py``).

Reference parity: no analogue in the reference tree — beyond-reference
pipeline surface (SURVEY §2-D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_D18 = "decimal(18,0)"


def term_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(term, c)`` unigram counts — one map-side-combined shuffle. NULL
    text contributes nothing; the corpus-standard space tokenizer."""
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                    lambda t: t != "",
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _joined_counts(
    docs_a: DataFrame, docs_b: DataFrame, text_col: str
) -> DataFrame:
    """Full-outer vocab join with exact totals attached: ``(term, c_a, c_b,
    n_a, n_b)`` — counts bigint, totals DECIMAL(18,0).

    Totals are window sums OVER THE JOINED VOCAB TABLE, not separate aggs
    of the raw corpora — a separate agg would re-run the corpus scan +
    explode + count shuffle a second time per corpus (no exchange reuse:
    the agg lineage differs from the join lineage). The global window costs
    one single-partition pass over the vocab-sized join output, the same
    trade the top-k rank below already makes.

    An EMPTY corpus fails loudly per-row (its window total is 0): a NULL
    or zero total would otherwise flow into every dshift and return
    plausible-looking garbage from a module whose contract is exact."""
    ca = term_counts(docs_a, text_col).withColumnRenamed("c", "c_a")
    cb = term_counts(docs_b, text_col).withColumnRenamed("c", "c_b")
    w_all = Window.partitionBy()

    def total(c: str, label: str):
        # sum over all-NULL (empty corpus) is NULL — fold it to 0 so the
        # guard below fires instead of NULL propagating through every dshift
        s = F.coalesce(F.sum(c).over(w_all), F.lit(0).cast("long"))
        return (
            F.when(
                s <= 0,
                F.raise_error(
                    F.lit(f"drift: corpus {label} has no tokens")
                ).cast(_D18),
            )
            .otherwise(s.cast(_D18))
        )

    return ca.join(cb, "term", "full_outer").select(
        "term",
        F.coalesce(F.col("c_a"), F.lit(0)).alias("c_a"),
        F.coalesce(F.col("c_b"), F.lit(0)).alias("c_b"),
        total("c_a", "A").alias("n_a"),
        total("c_b", "B").alias("n_b"),
    )


def unigram_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The ``top_k`` terms driving the drift between the corpora:
    ``(rnk, term, c_a, c_b, dshift)`` where ``dshift = c_a·N_b − c_b·N_a``
    (exact DECIMAL; positive = overrepresented in A). Ranked by |dshift|
    descending, term ascending on ties — a pure function of the data."""
    if top_k < 1:
        raise ValueError("unigram_drift: top_k must be >= 1")
    j = _joined_counts(docs_a, docs_b, text_col)
    dshift = (
        F.col("c_a").cast(_D18) * F.col("n_b")
        - F.col("c_b").cast(_D18) * F.col("n_a")
    ).alias("dshift")
    scored = j.select("term", "c_a", "c_b", dshift)
    w = Window.orderBy(F.abs(F.col("dshift")).desc(), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_k)
        .select("rnk", "term", "c_a", "c_b", "dshift")
    )


def drift_summary(
    docs_a: DataFrame, docs_b: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One row of exact integers: ``(n_tok_a, n_tok_b, n_terms_a, n_terms_b,
    tv_num, tv_den)`` with ``TV = tv_num / tv_den`` — the division is the
    caller's (it is the only non-exact step, so it stays out of the
    oracle-checked columns)."""
    j = _joined_counts(docs_a, docs_b, text_col)
    num = F.abs(
        F.col("c_a").cast(_D18) * F.col("n_b")
        - F.col("c_b").cast(_D18) * F.col("n_a")
    )

    def req(c):
        # both corpora empty -> the join has zero rows and every aggregate
        # is NULL; fail loudly rather than return a NULL "summary"
        return F.when(
            c.isNull(), F.raise_error(F.lit("drift: both corpora are empty"))
        ).otherwise(c)

    return j.agg(
        req(F.first("n_a")).alias("n_tok_a"),
        F.first("n_b").alias("n_tok_b"),
        F.sum(F.when(F.col("c_a") > 0, 1).otherwise(0)).alias("n_terms_a"),
        F.sum(F.when(F.col("c_b") > 0, 1).otherwise(0)).alias("n_terms_b"),
        F.sum(num).alias("tv_num"),
        F.first(F.lit(2).cast(_D18) * F.col("n_a") * F.col("n_b")).alias(
            "tv_den"
        ),
    )


# ------------------------------------------------- registration-ready twins

DRIFT_LANG_A = "en"
DRIFT_LANG_B = "fr"
DRIFT_TOP_K = 20


def _slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    from ..io import table

    d = table(spark, sf_dir, "documents")
    return (
        d.where(F.col("lang") == DRIFT_LANG_A),
        d.where(F.col("lang") == DRIFT_LANG_B),
    )


_LONG_MAX = "9223372036854775807"


def _long_exact(c, label: str):
    """DECIMAL → BIGINT, loudly: raise instead of wrapping if the exact
    value falls outside long range (the driver canonicalizes DECIMAL
    asymmetrically — module docstring — so registered outputs must be
    bigint; the no-silent-wraparound discipline still holds)."""
    lim = F.lit(_LONG_MAX).cast("decimal(38,0)")
    return F.when(
        F.abs(c) > lim,
        F.raise_error(F.lit(f"drift: {label} exceeds BIGINT range")).cast(
            "long"
        ),
    ).otherwise(c.cast("long"))


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top drift terms between the en and fr slices of documents — the
    corpus-version comparison a mixture re-cut runs, on fixture slices.
    ``dshift`` is cast DECIMAL→BIGINT (exact, guarded) for the driver's
    output contract; at sf0.1 |dshift| < 2·10^14, four orders inside."""
    a, b = _slices(spark, sf_dir)
    d = unigram_drift(a, b, DRIFT_TOP_K)
    return d.select(
        "rnk",
        "term",
        "c_a",
        "c_b",
        _long_exact(F.col("dshift"), "dshift").alias("dshift"),
    )


def q_corpus_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact total-variation numerator/denominator between the slices,
    every DECIMAL cast to BIGINT (exact, guarded) per the driver contract:
    tv_den = 2·N_a·N_b ≈ 8.8e9 at sf0.1 vs the 9.2e18 bigint ceiling."""
    a, b = _slices(spark, sf_dir)
    s = drift_summary(a, b)
    return s.select(
        *[
            _long_exact(F.col(c), c).alias(c)
            for c in ("n_tok_a", "n_tok_b")
        ],
        "n_terms_a",
        "n_terms_b",
        *[
            _long_exact(F.col(c), c).alias(c)
            for c in ("tv_num", "tv_den")
        ],
    )


_SQL_COUNTS = """
ca AS (
    SELECT t AS term, COUNT(*) AS c_a FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        FROM documents WHERE lang = '{la}'
    ) GROUP BY t
),
cb AS (
    SELECT t AS term, COUNT(*) AS c_b FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        FROM documents WHERE lang = '{lb}'
    ) GROUP BY t
),
na AS (SELECT CAST(SUM(c_a) AS DECIMAL(18,0)) AS n_a FROM ca),
nb AS (SELECT CAST(SUM(c_b) AS DECIMAL(18,0)) AS n_b FROM cb),
j AS (
    SELECT COALESCE(ca.term, cb.term) AS term,
           CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
           CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b,
           n_a, n_b
    FROM ca FULL OUTER JOIN cb ON ca.term = cb.term, na, nb
)
"""

SQL_CORPUS_DRIFT = (
    "WITH "
    + _SQL_COUNTS.format(la=DRIFT_LANG_A, lb=DRIFT_LANG_B)
    + f"""
SELECT rnk, term, c_a, c_b, CAST(dshift AS BIGINT) AS dshift
FROM (
    SELECT term, c_a, c_b,
           CAST(c_a AS DECIMAL(18,0)) * n_b
               - CAST(c_b AS DECIMAL(18,0)) * n_a AS dshift,
           ROW_NUMBER() OVER (
               ORDER BY ABS(CAST(c_a AS DECIMAL(18,0)) * n_b
                            - CAST(c_b AS DECIMAL(18,0)) * n_a) DESC,
                        term ASC
           ) AS rnk
    FROM j
)
WHERE rnk <= {DRIFT_TOP_K}
"""
)

SQL_CORPUS_DRIFT_TV = (
    "WITH "
    + _SQL_COUNTS.format(la=DRIFT_LANG_A, lb=DRIFT_LANG_B)
    + """
SELECT CAST(ANY_VALUE(n_a) AS BIGINT) AS n_tok_a,
       CAST(ANY_VALUE(n_b) AS BIGINT) AS n_tok_b,
       CAST(SUM(CASE WHEN c_a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_a,
       CAST(SUM(CASE WHEN c_b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_b,
       CAST(SUM(ABS(CAST(c_a AS DECIMAL(18,0)) * n_b
               - CAST(c_b AS DECIMAL(18,0)) * n_a)) AS BIGINT) AS tv_num,
       CAST(ANY_VALUE(CAST(2 AS DECIMAL(18,0)) * n_a * n_b) AS BIGINT) AS tv_den
FROM j
"""
)


QUERIES = {
    "q_corpus_drift": q_corpus_drift,
    "q_corpus_drift_tv": q_corpus_drift_tv,
}
ORACLES = {
    "q_corpus_drift": SQL_CORPUS_DRIFT,
    "q_corpus_drift_tv": SQL_CORPUS_DRIFT_TV,
}
