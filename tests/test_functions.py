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
