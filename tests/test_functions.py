"""functions.py determinism helpers: the lsum/lavg ≡ dsum/davg equivalence.

lsum's docstring carries a proof that the long scaled-integer sum is
bit-identical to the decimal sum whenever the integer sum fits 2^53; this test
exercises it on randomized 2dp/4dp data (fixed seed — the point is breadth of
magnitudes and signs, not flakiness) including negative values, exact .x5
boundaries, and group sizes from 1 to thousands.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hbase_observer_es_spark.functions import davg, dsum, lavg, lsum

random.seed(0xC0FFEE)


def _rows(n: int, scale: int) -> list[tuple[int, float]]:
    unit = 10**scale
    out = []
    for _ in range(n):
        grp = random.randrange(7)
        # exact scale-dp rationals across magnitudes, both signs, many ending .x5
        mag = 10 ** random.randrange(6)
        val = random.randrange(-mag * unit, mag * unit) / unit
        out.append((grp, val))
    return out


def test_lsum_matches_dsum_2dp(spark):
    df = spark.createDataFrame(_rows(5000, 2), "grp int, v double")
    got = (
        df.groupBy("grp")
        .agg(
            lsum("v", "l", scale=2),
            dsum("v", "d", scale=2),
            lavg("v", "la", scale=2),
            davg("v", "da", scale=2),
        )
        .collect()
    )
    for r in got:
        assert repr(r.l) == repr(r.d), (r.grp, r.l, r.d)
        assert repr(r.la) == repr(r.da), (r.grp, r.la, r.da)


def test_lsum_matches_dsum_4dp(spark):
    df = spark.createDataFrame(_rows(5000, 4), "grp int, v double")
    got = (
        df.groupBy("grp")
        .agg(lsum("v", "l", scale=4), dsum("v", "d", scale=4))
        .collect()
    )
    for r in got:
        assert repr(r.l) == repr(r.d), (r.grp, r.l, r.d)


def test_single_row_groups(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0.01, -0.01, 123456.78, -99999.99, 0.0])],
        "grp int, v double",
    )
    got = (
        df.groupBy("grp").agg(lsum("v", "l", scale=2), dsum("v", "d", scale=2)).collect()
    )
    for r in got:
        assert repr(r.l) == repr(r.d), (r.grp, r.l, r.d)
    # the single-row sum must round-trip the input exactly
    vals = {r.grp: r.l for r in got}
    assert vals[0] == 0.01 and vals[3] == -99999.99


def test_count_expr_still_uses_int_column(spark):
    # F.count(F.lit(1)) in lavg counts rows including those whose value rounds
    # to zero cents — a zero value must still contribute to the denominator
    df = spark.createDataFrame([(0, 0.0), (0, 2.0)], "grp int, v double")
    r = df.groupBy("grp").agg(lavg("v", "a", scale=2)).collect()[0]
    assert r.a == 1.0


def test_text_entropy_matches_python_twin(spark, tmp_path):
    """q_text_entropy's floor-log2 decomposition against the definitional
    per-token sum on a corpus with an empty doc, a single-token doc, and
    a repetitive doc (r15)."""
    from hbase_observer_es_spark.operators.text import q_text_entropy

    docs = [(0, "a a a a b"), (1, ""), (2, "x"), (3, None), (4, "w v u t")]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1) \
        .write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_unique"], r["ent_bits_floor"])
        for r in q_text_entropy(spark, str(tmp_path)).collect()
    }

    def twin(text):
        toks = [t for t in (text or "").split(" ") if t]
        if not toks:
            return (0, 0, 0)
        from collections import Counter
        c = Counter(toks)
        n = len(toks)
        flog2 = lambda x: x.bit_length() - 1
        ent = sum(v * (flog2(n) - flog2(v)) for v in c.values())
        return (n, len(c), ent)

    assert got == {i: twin(t) for i, t in docs}
    # spot-derive doc 0: N=5 flog2=2; c_a=4 flog2=2, c_b=1 flog2=0
    # ent = 4*(2-2) + 1*(2-0) = 2
    assert got[0] == (5, 2, 2)


def test_win_firstlast_full_frame_semantics(spark, tmp_path):
    """last_value must be the cohort's LAST row (pinned full frame), not
    the running current row the default frame would give; runner_up is
    NULL for a 1-row cohort."""
    from hbase_observer_es_spark.operators.relational_more import q_win_firstlast

    rows = [
        (1, "A", 50.0), (2, "A", 30.0), (3, "A", 10.0),
        (9, "B", 7.0),
    ]
    spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string, c_acctbal double"
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    got = {
        r["c_custkey"]: (r["richest"], r["poorest"], r["runner_up"])
        for r in q_win_firstlast(spark, str(tmp_path)).collect()
    }
    assert got[1] == (1, 3, 2)
    assert got[2] == (1, 3, 2)  # NOT (1, 2, 2): the frame is pinned full
    assert got[3] == (1, 3, 2)
    assert got[9] == (9, 9, None)
