"""Bigram-LM surprisal: fixed-point log2 properties, an independent
pure-Python model oracle matched bit-for-bit against the Spark plan,
gating behavior (fluent reference text scores lower than shuffled
text), plan shape (broadcast joins, no Python), and guards."""

from __future__ import annotations

import pytest

from hbase_observer_es_spark.operators.ngramlm import (
    FRAC_BITS,
    BigramLM,
    ilog2_fp,
    surprisal_frame,
    surprisal_py,
    train_bigram_lm,
)


# --------------------------------------------------------------- ilog2_fp

def test_ilog2_exact_powers_of_two():
    for e in (0, 1, 5, 16, 40, 63):
        assert ilog2_fp(1 << e) == e << FRAC_BITS


def test_ilog2_monotone_and_bounded():
    prev = -1
    for x in list(range(1, 600)) + [10**6, 10**6 + 1, 10**12]:
        v = ilog2_fp(x)
        assert v >= prev  # non-decreasing
        prev = v if x < 600 else -1
        # floor(log2 x) and the next integer bound the fixed-point value
        e = x.bit_length() - 1
        assert e << FRAC_BITS <= v < (e + 1) << FRAC_BITS


def test_ilog2_known_values():
    """Hand-checkable goldens: log2(3) = 1.58496…, log2(10) = 3.32192…
    — the fixed-point value must sit within one unit of 2^-16 of the
    true log (the truncating mantissa loses at most ~2^-16 here)."""
    assert abs(ilog2_fp(3) - round(1.584962500721156 * (1 << 16))) <= 1
    assert abs(ilog2_fp(10) - round(3.321928094887362 * (1 << 16))) <= 1
    with pytest.raises(ValueError, match=r"x must be >= 1"):
        ilog2_fp(0)


# ---------------------------------------------------------------- model

_REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog"),
]


def _tiny_model(spark) -> BigramLM:
    ref = spark.createDataFrame(_REF, "doc_id long, text string")
    return train_bigram_lm(ref)


def _py_model() -> BigramLM:
    """Independent reimplementation of training (plain dict counting)
    — the oracle train_bigram_lm must match exactly."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for _, t in _REF:
        toks = t.split()
        uni.update(toks)
        bi.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    v = len(uni)
    return BigramLM(
        {w: ilog2_fp(c + v) for w, c in uni.items()},
        {b: ilog2_fp(c + 1) for b, c in bi.items()},
        ilog2_fp(v),
        v,
    )


def test_training_matches_independent_counts(spark):
    m = _tiny_model(spark)
    py = _py_model()
    assert m.vocab_size == py.vocab_size
    assert m.lg_den == py.lg_den
    assert m.lg_num == py.lg_num
    assert m.default_den == py.default_den


def test_scoring_matches_python_twin_bit_for_bit(spark):
    m = _tiny_model(spark)
    docs = [
        (10, "the cat sat on the rug"),     # in-distribution
        (11, "rug the on sat cat the"),     # shuffled
        (12, "zebra quark flux"),           # all-OOV
        (13, "single"),                     # no bigram
        (14, ""),                           # empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.surprisal_fp, r.mean_surprisal_fp)
        for r in surprisal_frame(df, m).collect()
    }
    assert set(got) == {10, 11, 12, 13, 14}
    for doc_id, text in docs:
        n, total = surprisal_py(text.split(), m)
        mean = total // n if n else 0
        assert got[doc_id] == (n, total, mean), doc_id


def test_fluent_text_scores_below_shuffled(spark):
    """The gate's reason to exist: reference-like word order is cheaper
    than the same words shuffled or than OOV babble. (No ordering is
    asserted BETWEEN the two bad docs: with a 10-word vocab the uniform
    1/V unseen-context cost can undercut a busy seen context — the
    standard add-one artifact, gone at real vocabulary sizes.)"""
    m = _tiny_model(spark)
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat the on sat cat the"),
         (3, "zebra quark flux boson")],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.mean_surprisal_fp for r in surprisal_frame(df, m).collect()}
    assert s[1] < s[2] and s[1] < s[3]


def test_plan_is_broadcast_joins_no_python(spark):
    m = _tiny_model(spark)
    df = spark.createDataFrame([(1, "the cat sat")], "doc_id long, text string")
    plan = surprisal_frame(df, m)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for bad in ("PythonUDF", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan


def test_training_guards(spark):
    empty = spark.createDataFrame([(1, " ")], "doc_id long, text string")
    with pytest.raises(ValueError, match=r"reference corpus has no tokens"):
        train_bigram_lm(empty)
    ref = spark.createDataFrame(_REF, "doc_id long, text string")
    with pytest.raises(ValueError, match=r"over the 5 broadcast guard"):
        train_bigram_lm(ref, max_entries=5)


# --------------------------------------------- registration-ready twin

def test_q_lm_surprisal_matches_duckdb_oracle(spark):
    """The held twin's full registry-harness check: coarse integer-bits
    surprisal — training AND scoring — hash-compared against the one
    DuckDB SQL statement (floor(log2 x) = length(bin(x)) - 1 in both
    engines, so no fixed-point export is needed)."""
    from hbase_observer_es_spark.operators.ngramlm import (
        ORACLE_LM_SURPRISAL,
        q_lm_surprisal,
    )
    from tests.conftest import SF_ORACLE
    from tests.oracle_harness import compare, duckdb_con

    con = duckdb_con(SF_ORACLE)
    try:
        r = compare(
            "q_lm_surprisal", q_lm_surprisal(spark, SF_ORACLE), con,
            ORACLE_LM_SURPRISAL,
        )
        assert r.ok, r.detail
    finally:
        con.close()


def test_q_lm_surprisal_plan_is_broadcast_no_python(spark):
    from hbase_observer_es_spark.operators.ngramlm import q_lm_surprisal
    from tests.conftest import SF_ORACLE

    plan = (
        q_lm_surprisal(spark, SF_ORACLE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    for bad in ("PythonUDF", "BatchEvalPython", "ArrowEvalPython",
                "CartesianProduct"):
        assert bad not in plan


def test_q_lm_surprisal_vocab_counts_final_only_tokens(spark):
    """ADVICE r14 (high) regression: a reference token that only ever
    appears DOCUMENT-FINAL is in uni but never as any bigram's first word,
    so the old corpus-w1-keyed lookup undercounted v (count of MATCHED
    w1 rows) vs the oracle's COUNT(*) FROM uni. Reproducer from the
    advisory: docs [(0,'a a b'), (1,'a a a b')], ref = doc 0 → uni =
    {a:2, b:1}, v must be 2; the buggy plan used v=1 and scored
    surprisal_bits (0,0) vs the oracle's (2,3)."""
    import duckdb

    from hbase_observer_es_spark.operators.ngramlm import (
        ORACLE_LM_SURPRISAL,
        q_lm_surprisal,
    )

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a a a b")], "doc_id long, text string"
    )
    # route the fixture through the same io.table entry the query uses
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: (r["n_bigrams"], r["surprisal_bits"])
            for r in q_lm_surprisal(spark, d).collect()
        }
        con = duckdb.connect()
        try:
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')"
            )
            want = {
                r[0]: (r[1], r[2])
                for r in con.execute(ORACLE_LM_SURPRISAL).fetchall()
            }
        finally:
            con.close()
    assert got == want
    assert got[0] == (2, 2) and got[1] == (3, 3)
