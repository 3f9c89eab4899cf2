"""Bloom filter: no-false-negative property, FP rate vs theory, probe-path
equivalence (Column expr vs Arrow numpy), partitioning-invariant build, and
the decontamination composition pinned equal to the exact operator."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hbase_observer_es_spark.operators.bloom import (
    build_bloom,
    decontaminate_bloom,
    hash_cols,
    might_contain_expr,
    might_contain_pandas,
)

SF = "/root/testdata/sf0.001"


def _keys_df(spark, lo: int, hi: int, parts: int = 4):
    # deterministic string keys, scattered so nothing aligns with insertion
    rows = [(f"key-{(i * 2654435761) % 10_000_019}",) for i in range(lo, hi)]
    return spark.createDataFrame(rows, "k string").repartition(parts)


def test_no_false_negatives_both_paths(spark):
    members = _keys_df(spark, 0, 500)
    bloom = build_bloom(members, "k", 1 << 13, 5, count_items=True)
    assert bloom["n_items"] == 500
    # n_items is opt-in: the default build skips the second key-set pass
    assert build_bloom(members, "k", 1 << 13, 5)["n_items"] is None

    via_expr = members.select(
        might_contain_expr(F.col("k"), bloom).alias("hit")
    ).collect()
    assert all(r["hit"] for r in via_expr)

    h1, h2 = hash_cols(F.col("k"))
    via_np = members.select(
        might_contain_pandas(h1, h2, bloom).alias("hit")
    ).collect()
    assert all(r["hit"] for r in via_np)


def test_fp_rate_near_theory_and_paths_agree(spark):
    n, m, k = 500, 1 << 13, 5
    bloom = build_bloom(_keys_df(spark, 0, n), "k", m, k)
    probes = _keys_df(spark, 10_000, 14_000)  # disjoint from members
    h1, h2 = hash_cols(F.col("k"))
    both = probes.select(
        F.col("k"),
        might_contain_expr(F.col("k"), bloom).alias("e"),
        might_contain_pandas(h1, h2, bloom).alias("p"),
    ).collect()
    assert all(r["e"] == r["p"] for r in both)  # path equivalence
    fp = sum(1 for r in both if r["e"]) / len(both)
    theory = (1.0 - math.exp(-k * n / m)) ** k
    assert fp < max(3.0 * theory, 0.02), (fp, theory)


def test_null_keys_probe_false_and_skip_build(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    bloom = build_bloom(df, "k", 1 << 10, 4, count_items=True)
    assert bloom["n_items"] == 2
    rows = {
        r["k"]: r["hit"]
        for r in df.select(
            "k", might_contain_expr(F.col("k"), bloom).alias("hit")
        ).collect()
    }
    assert rows["a"] and rows["b"]
    assert rows[None] is False
    h1, h2 = hash_cols(F.col("k"))
    rows_np = {
        r["k"]: r["hit"]
        for r in df.select(
            "k",
            might_contain_pandas(
                h1, h2, bloom, key_is_null=F.col("k").isNull()
            ).alias("hit"),
        ).collect()
    }
    assert rows_np == rows


def test_null_keys_probe_false_even_when_saturated(spark):
    """xxhash64(NULL) is the (non-null) seed hash, so a saturated filter
    would answer TRUE for NULL keys if the NULL rule keyed off the hashes —
    it must key off the key column itself, on BOTH probe paths."""
    df = spark.createDataFrame([("a",), (None,)], "k string")
    saturated = {"words": [-1], "m_bits": 64, "k": 4, "n_items": None}
    rows = {
        r["k"]: r["hit"]
        for r in df.select(
            "k", might_contain_expr(F.col("k"), saturated).alias("hit")
        ).collect()
    }
    assert rows == {"a": True, None: False}
    h1, h2 = hash_cols(F.col("k"))
    rows_np = {
        r["k"]: r["hit"]
        for r in df.select(
            "k",
            might_contain_pandas(
                h1, h2, saturated, key_is_null=F.col("k").isNull()
            ).alias("hit"),
        ).collect()
    }
    assert rows_np == rows


def test_pandas_probe_refuses_nullable_hashes(spark):
    """A nullable int64 hash batch reaches pandas as float64, corrupting
    every hash > 2^53 — the probe must fail loud, never fix it up."""
    df = spark.createDataFrame([("a",), (None,)], "k string")
    bloom = build_bloom(df, "k", 1 << 10, 4)
    h1, h2 = hash_cols(F.col("k"))
    nullable_h1 = F.when(F.col("k").isNotNull(), h1)  # NULL for the NULL key
    with pytest.raises(Exception, match="NULL hash input"):
        df.select(
            might_contain_pandas(nullable_h1, h2, bloom).alias("hit")
        ).collect()


def test_build_is_partitioning_invariant(spark):
    a = build_bloom(_keys_df(spark, 0, 300, parts=1), "k", 1 << 12, 6)
    b = build_bloom(_keys_df(spark, 0, 300, parts=13), "k", 1 << 12, 6)
    assert a == b


def test_long_keys_work(spark):
    df = spark.range(0, 400).select((F.col("id") * 7919).alias("k"))
    bloom = build_bloom(df, "k", 1 << 12, 5)
    hits = df.select(might_contain_expr(F.col("k"), bloom).alias("h")).collect()
    assert all(r["h"] for r in hits)


def test_validation(spark):
    df = _keys_df(spark, 0, 10)
    with pytest.raises(ValueError, match="power of two"):
        build_bloom(df, "k", 1000, 4)
    with pytest.raises(ValueError, match="exceeds"):
        build_bloom(df, "k", 1 << 30, 4)
    with pytest.raises(ValueError, match="k must be"):
        build_bloom(df, "k", 1 << 10, 0)
    with pytest.raises(ValueError, match="not in"):
        build_bloom(df, "nope", 1 << 10, 4)
    big = {"words": [0] * ((1 << 22) // 64), "m_bits": 1 << 22, "k": 4}
    with pytest.raises(ValueError, match="might_contain_pandas"):
        might_contain_expr(F.col("k"), big)


def test_decontaminate_bloom_equals_exact(spark):
    """The composition pin: the bloom pre-filter changes the plan, never the
    answer — no false negatives means no lost collision, and the exact join
    kills every false positive."""
    from hbase_observer_es_spark.operators.pipeline import q_decontaminate

    exact = sorted(map(tuple, q_decontaminate(spark, SF).collect()))
    via_bloom = sorted(map(tuple, decontaminate_bloom(spark, SF).collect()))
    assert via_bloom == exact
    # and a deliberately tiny, saturated filter still agrees (FP-heavy)
    tiny = sorted(
        map(tuple, decontaminate_bloom(spark, SF, m_bits=64, k=1).collect())
    )
    assert tiny == exact
