"""PII detection/redaction accounting — the scrubbing pass every large-scale
training-data pipeline runs before anything else touches the corpus.

No reference analogue (the reference ships raw HBase cells to ES untouched —
HbaseDataSyncEsObserver.java:73-80 forwards values verbatim); this belongs to
the LLM-data-pipeline family mandated alongside SURVEY.md §2 (dedup /
similarity / text-analysis / pipeline).

Fixture note (disclosed): the synthetic corpus contains no PII-like spans —
zero digits, zero '@' (verified) — so a scan over raw `text` would verify a
pipeline that provably matches nothing. The query therefore derives a
DETERMINISTIC augmented view (doc_id-seeded email + phone spans appended to
the text) and runs detection/redaction over that. The augmentation is two
string concats, identical on both engines; the detection, redaction, and
accounting machinery — the part a user would reuse on a real corpus — is the
thing under test.

Determinism: the patterns use only character classes, literals, +/{n}
quantifiers — constructs where Java regex (Spark) and RE2 (DuckDB) agree
exactly, with leftmost-longest irrelevant (no alternation overlap). All
accounting is integer arithmetic.

Scale: map-only — scan → project (concat, two regexp_extract_all, two
regexp_replace, lengths) → one map-side-combined groupBy on source. No join,
no window, no second pass; the redacted column itself is dropped before the
aggregate so only integer counters cross the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

# Java-regex/RE2-common subset only (see module docstring).
EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
PHONE_RE = "555-[0-9]{4}"


def pii_per_doc(d: DataFrame) -> DataFrame:
    """Per-document detection/redaction counters over a documents-shaped frame
    (batch or streaming — pure column math, so the same expression tree serves
    both; s_pii_stream reuses this verbatim)."""
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    )
    emails = F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), F.lit(0)))
    phones = F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "source",
        emails.alias("n_email"),
        phones.alias("n_phone"),
        (F.length(aug) - F.length(redacted)).alias("removed"),
    )


def pii_report(per_doc: DataFrame) -> DataFrame:
    """The per-source audit reduction shared by the batch and streaming forms."""
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("email_hits"),
        F.sum("n_phone").cast("bigint").alias("phone_hits"),
        F.sum(((F.col("n_email") > 0) | (F.col("n_phone") > 0)).cast("bigint"))
        .cast("bigint")
        .alias("docs_with_pii"),
        F.sum("removed").cast("bigint").alias("chars_removed"),
    )


def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub accounting per source: documents scanned, email/phone span
    counts, documents carrying any PII, and total characters removed by
    redaction (redacted tokens: <EMAIL>, <PHONE>).

    chars_removed is computed as length(augmented) − length(redacted) — the
    audit number a compliance report wants — and is exact integer arithmetic.
    """
    return pii_report(pii_per_doc(table(spark, sf_dir, "documents")))


SQL_TEXT_PII = f"""
WITH aug AS (
    SELECT source,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or call 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS a
    FROM documents
),
per_doc AS (
    SELECT source,
           len(regexp_extract_all(a, '{EMAIL_RE}')) AS n_email,
           len(regexp_extract_all(a, '{PHONE_RE}')) AS n_phone,
           length(a) - length(
               regexp_replace(
                   regexp_replace(a, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g')) AS removed
    FROM aug
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS email_hits,
       CAST(SUM(n_phone) AS BIGINT) AS phone_hits,
       CAST(SUM(CASE WHEN n_email > 0 OR n_phone > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_pii,
       CAST(SUM(removed) AS BIGINT) AS chars_removed
FROM per_doc
GROUP BY source
"""


QUERIES = {"q_text_pii": q_text_pii}
ORACLES = {"q_text_pii": SQL_TEXT_PII}
