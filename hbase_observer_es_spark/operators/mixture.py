"""Mixture materialization: turn sampling weights into actual rows.

``q_mixture_weights`` (pipeline.py) computes per-slice weights; a training
run then needs the MIX itself — the corpus with each slice up- or
down-sampled to its weight, deterministically, so two runs (or a rerun
after a crash) materialize byte-identical datasets. Two operators:

* :func:`select_top_per_group` — quota selection: the top ``n`` documents
  per slice by a score column (classifier margin, link rank, length),
  ties broken by id ascending. One hash exchange + per-group
  ``row_number`` cut; the standard "budgeted best-of" move when the mix
  is specified in document counts.

* :func:`realize_mixture` — fractional repetition: each slice's factor is
  a FIXED-POINT parts-per-million integer (``2_500_000`` = 2.5 epochs;
  ``250_000`` = keep 25%). Every document repeats ``factor // 1e6`` times,
  plus one more iff ``md5_coin(id) < factor % 1e6`` — an md5-derived
  uniform coin (see ``_md5_coin`` for why the polynomial text hash is
  WRONG here), a pure function of the id: zero RNG, rerun-stable,
  exactly replayable in SQL, and a factor below 1e6 becomes
  deterministic DOWN-sampling of the same form (repeat count 0 drops
  the row). Output carries ``rep_idx`` (1-based)
  so downstream shuffling/packing can treat repeats as distinct rows.
  Map-only: a literal CASE over the slice column and one ``explode`` —
  no shuffle at all; the expected realized share converges to the factor
  by hash uniformity (measured in tests, not assumed).

Why fixed-point ppm and not the float ``upsample_factor``: floor/compare
on engine-computed doubles is a cross-engine hazard the exactness rules
exist to avoid; the ppm contract keeps every branch integer. Converting
the mixture query's weights to ppm (one ``round`` at the boundary, off
the oracle path) is the caller's single lossy step, stated explicitly.

REGISTERED round 15 (held r11–r14 for driver-window headroom — the last
of the held queue): ``q_mix_select`` / ``q_mix_realize`` over documents,
DuckDB-hash-checked
in ``tests/test_mixture.py``.

Reference parity: no analogue in the reference tree — beyond-reference
pipeline surface (SURVEY §2-D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PPM = 1_000_000


COIN_SALT = ":mixcoin"  # keeps the coin independent of other id-hash uses


def _md5_coin(col):
    """Uniform cross-engine coin in [0, PPM): fold the first 8 hex chars of
    ``md5(id || salt)`` base-16 (32 bits), reduce mod PPM.

    NOT the repo's polynomial text hash: for the short numeric strings ids
    render to, that fold is nearly ORDER-PRESERVING (a 3-digit id hashes
    below ~52k), so ``% PPM`` is a function of id magnitude, not a coin —
    measured: a 0.3 fractional factor realized 0.05. md5 renders the same
    lowercase hex in Spark and DuckDB; the hex→int fold is plain integer
    arithmetic in both; 2^32 % PPM leaves a ~0.02% residue bias, off the
    oracle path (both engines compute the identical biased value)."""
    hexc = F.split(F.substring(F.md5(F.concat(col, F.lit(COIN_SALT))), 1, 8), "")
    val = lambda a: a - F.lit(48) - F.when(a >= F.lit(97), F.lit(39)).otherwise(
        F.lit(0)
    )
    return (
        F.aggregate(
            F.transform(hexc, lambda ch: val(F.ascii(ch).cast("long"))),
            F.lit(0).cast("long"),
            lambda acc, v: acc * F.lit(16) + v,
        )
        % F.lit(PPM)
    )


def select_top_per_group(
    docs: DataFrame,
    group_col: str,
    score_col: str,
    quota: int | dict[str, int],
    id_col: str = "doc_id",
) -> DataFrame:
    """The top ``quota`` rows per group by ``(score desc, id asc)`` with a
    dense ``rnk`` column. ``quota`` is one int for every group or a
    per-group dict (groups absent from the dict contribute NOTHING —
    an unlisted slice is excluded, not unlimited)."""
    if isinstance(quota, int):
        if quota < 1:
            raise ValueError("quota must be >= 1")
        cap = F.lit(quota)
    else:
        if not quota:
            raise ValueError("quota dict is empty")
        for g, n in quota.items():
            if n < 0:
                raise ValueError(f"negative quota for group {g!r}")
        cap = None
        for g, n in quota.items():
            cond = F.col(group_col) == F.lit(g)
            cap = F.when(cond, F.lit(n)) if cap is None else cap.when(cond, F.lit(n))
        cap = cap.otherwise(F.lit(0))
    w = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= cap)
        .select(id_col, group_col, score_col, "rnk")
    )


def realize_mixture(
    docs: DataFrame,
    factor_ppm: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the mix: ``(id, group, n_repeats, rep_idx)`` with each
    input row emitted ``n_repeats`` times (possibly zero — deterministic
    downsampling). See module docstring for the exact ppm coin."""
    if not factor_ppm:
        raise ValueError("factor_ppm is empty")
    for g, p in factor_ppm.items():
        if p < 0:
            raise ValueError(f"negative factor_ppm for group {g!r}")
    ppm = None
    for g, p in factor_ppm.items():
        cond = F.col(group_col) == F.lit(g)
        ppm = F.when(cond, F.lit(p)) if ppm is None else ppm.when(cond, F.lit(p))
    ppm = ppm.otherwise(F.lit(0)).cast("long")
    # a NULL id would make the coin NULL and the row vanish SILENTLY from
    # the mix (NULL n_repeats fails the >0 filter) — fail like every other
    # invalid input; only unlisted GROUPS drop by documented contract
    id_s = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(
                f"realize_mixture: NULL {id_col!r} — the repeat coin is a "
                "function of the id; drop or key unidentified rows upstream"
            )
        ),
    ).otherwise(F.col(id_col).cast("string"))
    coin = _md5_coin(id_s)
    # integer-exact whole part: subtract the remainder BEFORE dividing so
    # the double division is over an exact multiple (plain ppm/PPM would
    # ride float truncation, fine today but not an exactness argument)
    whole = ((ppm - ppm % F.lit(PPM)) / F.lit(PPM)).cast("long")
    n_rep = whole + (coin < ppm % F.lit(PPM)).cast("long")
    return (
        docs.select(
            F.col(id_col),
            F.col(group_col),
            n_rep.alias("n_repeats"),
        )
        .where(F.col("n_repeats") > 0)
        .select(
            id_col,
            group_col,
            "n_repeats",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_repeats"))).alias(
                "rep_idx"
            ),
        )
    )


# ------------------------------------------------- registration-ready twins

MIX_QUOTA = 30
MIX_FACTORS = {  # a 2-epoch-ish multilingual recipe over the fixture slices
    "en": 1_000_000,
    "fr": 2_500_000,
    "de": 2_000_000,
    "es": 1_250_000,
    "zh": 750_000,
}


def q_mix_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota selection twin: top documents per lang by length."""
    from ..io import table

    return select_top_per_group(
        table(spark, sf_dir, "documents"), "lang", "n_chars", MIX_QUOTA
    )


SQL_MIX_SELECT = f"""
SELECT doc_id, lang, n_chars, rnk
FROM (
    SELECT doc_id, lang, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
           ) AS rnk
    FROM documents
)
WHERE rnk <= {MIX_QUOTA}
"""


def q_mix_realize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture realization twin: the fixture slices at the MIX_FACTORS
    recipe — en passes through, fr/de/es upsample, zh downsamples."""
    from ..io import table

    return realize_mixture(table(spark, sf_dir, "documents"), MIX_FACTORS)


_SQL_PPM_CASE = "CASE " + " ".join(
    f"WHEN lang = '{g}' THEN {p}" for g, p in MIX_FACTORS.items()
) + " ELSE 0 END"

_SQL_COIN = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split("
    f"substr(md5(CAST(doc_id AS VARCHAR) || '{COIN_SALT}'), 1, 8), ''), "
    "c -> CAST(ascii(c) AS BIGINT) - 48 "
    "- CASE WHEN ascii(c) >= 97 THEN 39 ELSE 0 END)), "
    f"(acc, v) -> acc * 16 + v) % {PPM}"
)

SQL_MIX_REALIZE = f"""
WITH base AS (
    SELECT doc_id, lang,
           CAST({_SQL_PPM_CASE} AS BIGINT) AS ppm,
           {_SQL_COIN} AS coin
    FROM documents
),
reps AS (
    SELECT doc_id, lang,
           ppm // {PPM} + CASE WHEN coin < ppm % {PPM} THEN 1 ELSE 0 END
               AS n_repeats
    FROM base
)
SELECT doc_id, lang, n_repeats, CAST(unnest(range(1, n_repeats + 1)) AS BIGINT) AS rep_idx
FROM reps
WHERE n_repeats > 0
"""


QUERIES = {
    "q_mix_select": q_mix_select,
    "q_mix_realize": q_mix_realize,
}
ORACLES = {
    "q_mix_select": SQL_MIX_SELECT,
    "q_mix_realize": SQL_MIX_REALIZE,
}
