"""Distributed Bloom filters: the broadcast-membership scale path.

Several pipeline stages reduce to "is this key in a reference set?" with the
reference set small enough to ship to every executor but large enough that
shipping it VERBATIM hurts: decontamination (eval-set shingles vs the
corpus), blocklist filtering, incremental-ingest "seen before" checks. A
Bloom filter compresses the reference set to ~10-16 bits per element with
ZERO false negatives (misses are definitive) and a tunable false-positive
rate — the standard construction (Bloom 1970; the same design Spark's own
runtime row-group filtering and Parquet's bloom pages use) so a "maybe"
only costs a redundant exact check, never a wrong answer.

Layout and determinism:

* **Bits** live in a dense ``m_bits/64``-long vector of signed int64 words
  (position ``p`` → word ``p >> 6``, bit ``p & 63``). ``m_bits`` must be a
  power of two so double hashing below probes uniformly.
* **Hashing** is Spark's ``xxhash64`` twice (the plain column, and the
  column salted with a constant literal) combined by double hashing
  ``pos_i = (h1 + i * (h2 | 1)) mod m`` — ``h2`` forced odd so the probe
  stride is coprime with the power-of-two ``m`` and the k positions are
  distinct. Both build and probe derive positions from the SAME JVM-side
  hash columns (``hash_cols``), so build/probe consistency — the no-false-
  negative property — holds by construction, not by reimplementation.
* **Build** is one shuffle: explode the k positions, distinct, ``bit_or``
  the word contributions per word index — map-side partial aggregation of
  pure bit arithmetic. The driver collects at most ``m_bits/64`` words
  (bounded by the validated ``m_bits`` cap, 2^27 bits = 16 MiB), never
  row data. The dense vector is a pure function of the key SET — identical
  bytes under any input partitioning or row order.
* **Probe** has two forms matching the repo's UDF discipline: a pure
  Column expression over a literal word array (whole-stage codegen; plan
  size grows with ``m_bits``, so it is refused above 2^20 bits), and an
  Arrow-vectorized ``pandas_udf`` over a numpy word vector for real sizes
  (the closure broadcasts once per executor — the 100 TB form).

``decontaminate_bloom`` is the composition this module exists for: the
corpus side is pre-filtered map-only against the bloom (no-FN ⇒ nothing
real is lost), and the exact broadcast join then runs over the tiny
survivor set (FPs die there). Its result is pinned EQUAL to
``pipeline.q_decontaminate`` — the bloom changes the plan, never the
answer.

Reference parity: no analogue in the reference tree — beyond-reference
pipeline surface (SURVEY §2-D), the scale companion to
``pipeline.q_decontaminate``'s broadcast asymmetry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SALT = "bloom-h2-salt"
_MAX_BITS = 1 << 27  # 16 MiB of driver/broadcast words — the hard cap
_MAX_EXPR_BITS = 1 << 20  # literal-array probe: 16k int64 literals max
_U64 = (1 << 64) - 1


def hash_cols(col: Column) -> tuple[Column, Column]:
    """The (h1, h2) hash pair both build and probe derive positions from.
    h2 is forced ODD (stride coprime with the power-of-two m)."""
    h1 = F.xxhash64(col)
    h2 = F.xxhash64(col, F.lit(_SALT)).bitwiseOR(F.lit(1))
    return h1, h2


def _positions(h1: Column, h2: Column, m_bits: int, k: int) -> list[Column]:
    # reduce mod m BEFORE combining: h1 + i*h2 on raw hashes overflows
    # int64 (an ANSI-mode error). Legal because m is a power of two, so
    # mod-2^64 wraparound and mod-m commute — which is also exactly why the
    # numpy probe's uint64 arithmetic computes the identical positions.
    r1 = F.pmod(h1, F.lit(m_bits))
    r2 = F.pmod(h2, F.lit(m_bits))  # odd in, odd out: m is a power of two
    return [
        F.pmod(r1 + F.lit(i) * r2, F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


def _validate(m_bits: int, k: int) -> None:
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    if m_bits > _MAX_BITS:
        raise ValueError(
            f"m_bits {m_bits} exceeds the {_MAX_BITS} cap (16 MiB of words)"
        )
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")


def build_bloom(
    df: DataFrame, col: str, m_bits: int, k: int, count_items: bool = False
) -> dict:
    """Build the filter over the distinct values of ``df[col]``. Returns
    ``{"words", "m_bits", "k", "n_items"}`` — ``words`` is the dense signed
    int64 vector. ``n_items`` (the distinct key count, for FP-rate math) is
    populated only when ``count_items=True``: it costs a SECOND full pass
    over the key set, which the production compositions never need — pay it
    only when you are actually tuning the filter."""
    _validate(m_bits, k)
    if col not in df.columns:
        raise ValueError(f"bloom column {col!r} not in {df.columns}")
    h1, h2 = hash_cols(F.col(col))
    pos = F.explode(F.array(*_positions(h1, h2, m_bits, k))).alias("pos")
    contrib = df.where(F.col(col).isNotNull()).select(pos)
    # no distinct needed before the aggregation: bit_or is idempotent, so
    # duplicate keys (and position collisions) cost shuffle bytes only —
    # and the shuffle rows are (word, contribution) pairs after the
    # map-side partial, at most m_bits/64 per task
    words_rows = (
        contrib.select(
            F.shiftright(F.col("pos"), 6).alias("w"),
            # the PySpark shiftleft wrapper only takes a literal shift —
            # call the SQL function, whose numBits side is a full expression
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos").bitwiseAND(F.lit(63))).cast("int"),
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    n_items = (
        df.where(F.col(col).isNotNull()).select(col).distinct().count()
        if count_items
        else None
    )
    words = [0] * (m_bits // 64)
    for r in words_rows:
        words[int(r["w"])] = int(r["word"])
    return {"words": words, "m_bits": m_bits, "k": k, "n_items": n_items}


def might_contain_expr(col: Column, bloom: dict) -> Column:
    """Pure-Column probe: TRUE iff all k bits are set. NULL keys probe
    FALSE — gated on ``col.isNotNull()`` explicitly, because ``xxhash64``
    maps NULL to the (non-null) seed hash, so the hash pair alone cannot
    distinguish a NULL key from a real one. Plan size scales with m_bits —
    refused above 2^20 bits; use ``might_contain_pandas`` beyond that."""
    m_bits, k, words = bloom["m_bits"], bloom["k"], bloom["words"]
    _validate(m_bits, k)
    if m_bits > _MAX_EXPR_BITS:
        raise ValueError(
            f"m_bits {m_bits} too large for the literal-array probe "
            f"(cap {_MAX_EXPR_BITS}) — use might_contain_pandas"
        )
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    h1, h2 = hash_cols(col)
    cond = None
    for pos in _positions(h1, h2, m_bits, k):
        word = F.element_at(arr, (F.shiftright(pos, 6) + F.lit(1)).cast("int"))
        # arithmetic shiftright then &1 extracts bit (pos & 63) correctly
        # for every bit index including 63 (sign fill dies at the &1);
        # call_function because the wrapper's shift side is literal-only
        bit = F.call_function(
            "shiftright", word, (pos.bitwiseAND(F.lit(63))).cast("int")
        ).bitwiseAND(F.lit(1))
        term = bit == F.lit(1)
        cond = term if cond is None else (cond & term)
    # the bit terms are never NULL (xxhash64 is total), so the NULL-key rule
    # must come from the key column itself
    return col.isNotNull() & cond


def might_contain_pandas(
    h1: Column, h2: Column, bloom: dict, key_is_null: Column | None = None
) -> Column:
    """Arrow-vectorized probe over the JVM-computed hash pair (pass the
    ``hash_cols`` outputs — hashing stays JVM-side, only the bit lookups run
    in numpy). The word vector is captured in the closure once per executor.

    The hash inputs must be NON-NULL int64 — which ``hash_cols`` guarantees
    (``xxhash64`` is total, mapping even a NULL key to the seed hash). That
    contract is load-bearing: Arrow delivers a NULLABLE int64 batch to
    pandas as float64, silently rounding every hash of magnitude > 2^53 in
    the batch — false negatives for NON-null rows. The conversion below
    therefore refuses NaN loudly rather than fixing it up.

    Because the hash pair cannot distinguish a NULL key (see above), pass
    ``key_is_null=F.col(key).isNull()`` when the key column is nullable —
    those rows probe FALSE (a NULL is never inserted). Omitting it asserts
    the keys are known non-null."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m_bits, k = bloom["m_bits"], bloom["k"]
    _validate(m_bits, k)
    w = np.array([x & _U64 for x in bloom["words"]], dtype=np.uint64)

    @pandas_udf("boolean")
    def probe(a, b, knull):
        import pandas as pd

        if a.isna().any() or b.isna().any():
            raise ValueError(
                "might_contain_pandas: NULL hash input — pass hash_cols "
                "outputs (total, never NULL); a nullable hash column arrives "
                "as float64 and corrupts every hash > 2^53 in the batch"
            )
        av = a.to_numpy(dtype=np.int64).astype(np.uint64)
        bv = b.to_numpy(dtype=np.int64).astype(np.uint64)
        ok = np.ones(len(av), dtype=bool)
        for i in range(k):
            pos = (av + np.uint64(i) * bv) % np.uint64(m_bits)
            word = w[(pos >> np.uint64(6)).astype(np.int64)]
            bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
            ok &= bit == np.uint64(1)
        ok &= ~knull.fillna(False).to_numpy(dtype=bool)
        return pd.Series(ok)

    mask = key_is_null if key_is_null is not None else F.lit(False)
    return probe(h1, h2, mask)


def decontaminate_bloom(
    spark: SparkSession, sf_dir: str, m_bits: int = 1 << 16, k: int = 7
) -> DataFrame:
    """``pipeline.q_decontaminate`` with a bloom pre-filter on the corpus
    side: build the filter over the EVAL shingle set (the small side), prune
    training shingles map-only (no false negatives — no real collision can
    be lost), and run the exact broadcast join only over the survivors
    (false positives die there). Same answer, and at 100 TB the broadcast
    payload drops from the full eval shingle set to ``m_bits/8`` bytes while
    the join input shrinks by the corpus' true-negative fraction."""
    from .pipeline import DECON_EVAL_SRC, _decon_shingles
    from ..io import table

    sh = _decon_shingles(table(spark, sf_dir, "documents"))
    ev = (
        sh.filter(F.col("source") == DECON_EVAL_SRC)
        .select("h", F.col("doc_id").alias("eval_id"))
    )
    tr = sh.filter(F.col("source") != DECON_EVAL_SRC)
    bloom = build_bloom(ev, "h", m_bits, k)
    h1, h2 = hash_cols(F.col("h"))
    pruned = tr.where(
        might_contain_pandas(h1, h2, bloom, key_is_null=F.col("h").isNull())
    )
    return (
        pruned.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").alias("n_eval_docs"),
            F.countDistinct("h").alias("n_shingles"),
        )
    )
