"""Incremental ingestion: keep only documents never seen in prior snapshots.

A continuously-crawled corpus re-fetches most of the web every cycle; the
daily production operation is "drop everything whose CONTENT we already
have" against the union of all prior generations. Two pieces:

* :func:`snapshot_hashes` — the per-generation artifact: the DISTINCT
  ``md5(text)`` content hashes of a published corpus (hex string — md5
  renders identically in Spark and DuckDB, so the artifact is
  engine-portable). Persist it next to the dataset manifest; generations
  union by plain ``UNION`` (distinct-ness is re-established on read).

* :func:`unseen_docs` — the filter: new-batch documents whose content
  hash is NOT in the seen set. The exact form is one ``left_anti`` join;
  the scale form puts the seen set on the Bloom diet first
  (``operators/bloom.py``): probe the filter map-only (zero false
  negatives ⇒ nothing truly new is lost), then run the exact anti-join
  ONLY over the rows the filter claims are seen (false positives die
  there). At 100 TB the asymmetry is the point: the overwhelmingly-unseen
  crawl majority never reaches the join — the same composition shape as
  ``decontaminate_bloom``, pinned EQUAL to the plain anti-join by test.

NULL text hashes like empty text? No: ``md5(NULL)`` is NULL, a NULL hash
would silently pass every anti-join, and "content we cannot hash" is not
"content we have never seen" — NULL text fails loudly on BOTH sides
(snapshot and filter), matching the publication sinks' contract.

Registration-ready twin (held for r11 window headroom):
``q_incremental_unseen`` over documents — the new batch is a RE-CRAWL of
the whole table (how incremental ingestion actually meets old content:
the crawler re-fetches it) against a prior generation holding the
``doc_id % 3 == 0`` slice's content, so the filter provably drops the
re-fetched third and keeps the rest. ``SQL_INCREMENTAL_UNSEEN`` is the
DuckDB anti-join mirror, hash-checked in ``tests/test_incremental.py``.

Reference parity: no analogue in the reference tree — beyond-reference
pipeline surface (SURVEY §2-D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bloom import build_bloom, hash_cols, might_contain_pandas

DEFAULT_M_BITS = 1 << 22  # 512 KiB of words — ~300k seen hashes at 1% FP
DEFAULT_K = 7


def _content_hash(text_col: str):
    c = F.col(text_col)
    return F.when(
        c.isNull(),
        F.raise_error(
            F.lit(
                f"incremental: NULL {text_col!r} — unhashable content is "
                "not 'never seen'; drop or repair upstream"
            )
        ),
    ).otherwise(F.md5(c))


def snapshot_hashes(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The per-generation seen-set artifact: one ``h`` column of distinct
    md5 hex content hashes."""
    return docs.select(_content_hash(text_col).alias("h")).distinct()


def unseen_docs(
    new_docs: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    use_bloom: bool = True,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    spill_dir: str | None = None,
) -> DataFrame:
    """New-batch rows whose content hash is absent from ``seen`` (a
    :func:`snapshot_hashes`-shaped frame, column ``h``). ``use_bloom=False``
    is the plain exact anti-join — the oracle twin the bloom path is
    pinned equal to.

    The bloom path is a TEE (definitive-miss branch + maybe branch), and
    Spark does not share a lazy source across union branches — without a
    materialization boundary the batch is scanned and probed TWICE. For a
    fixture-sized batch that is fine (and the default); at crawl scale
    pass ``spill_dir``: the hashed+flagged batch lands there as parquet in
    ONE pass over the input, and both branches read the cheap columnar
    copy. (A re-crawl batch usually IS landed parquet already — then the
    double scan is columnar and the spill is optional.)"""
    if "h" not in seen.columns:
        raise ValueError(f"incremental: seen frame lacks 'h' (has {seen.columns})")
    hashed = new_docs.withColumn("__h", _content_hash(text_col))
    seen_h = seen.select(F.col("h").alias("__h")).distinct()
    if not use_bloom:
        out = hashed.join(seen_h, "__h", "left_anti")
        return out.drop("__h")
    bloom = build_bloom(seen_h, "__h", m_bits, k)
    h1, h2 = hash_cols(F.col("__h"))
    maybe_seen = might_contain_pandas(
        h1, h2, bloom, key_is_null=F.col("__h").isNull()
    )
    flagged = hashed.withColumn("__maybe", maybe_seen)
    if spill_dir is not None:
        # one scan of the input; the tee below reads the landed copy
        flagged.write.mode("overwrite").parquet(spill_dir)
        spark = new_docs.sparkSession
        flagged = spark.read.parquet(spill_dir)
    # definitive misses pass map-only; only the filter's "maybe" set (true
    # positives + FPs) pays the exact join, and FPs survive it
    definite_new = flagged.where(~F.col("__maybe"))
    candidates = flagged.where(F.col("__maybe"))
    confirmed_new = candidates.join(seen_h, "__h", "left_anti")
    return definite_new.unionByName(confirmed_new).drop("__h", "__maybe")


# ------------------------------------------------- registration-ready twin

INC_PRIOR_MOD = 3  # doc_id % 3 == 0 -> the prior generation


def q_incremental_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental filter twin over the documents fixture: the new batch
    re-crawls the WHOLE table, the prior generation holds one third of its
    content — the filter must drop exactly the re-fetched content. Output
    is the unseen new-batch rows' scalar columns."""
    from ..io import table

    d = table(spark, sf_dir, "documents")
    prior = d.where(F.col("doc_id") % INC_PRIOR_MOD == 0)
    return unseen_docs(d, snapshot_hashes(prior)).select(
        "doc_id", "lang", "source", "n_chars"
    )


SQL_INCREMENTAL_UNSEEN = f"""
WITH seen AS (
    SELECT DISTINCT md5(text) AS h
    FROM documents WHERE doc_id % {INC_PRIOR_MOD} = 0
)
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE md5(text) NOT IN (SELECT h FROM seen)
"""


# Registered round 11 (the r10 window cleared): the bloom-first re-crawl
# filter is driver-verified against the exact anti-join oracle above.
QUERIES = {"q_incremental_unseen": q_incremental_unseen}
ORACLES = {"q_incremental_unseen": SQL_INCREMENTAL_UNSEEN}
