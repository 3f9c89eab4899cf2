"""Product quantization (operators/pq.py): codebook shape and determinism,
bit-exact model agreement for encode/ADC, pack/unpack inversion, and the
serving-path ordering contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hbase_observer_es_spark.io import table
from hbase_observer_es_spark.operators.pq import (
    PQ_K,
    PQ_M,
    _PACK_BASE,
    pq_adc_topk,
    pq_encode,
    pq_train,
    unpack_code,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def codebook(spark, emb):
    cb = pq_train(emb)
    cb.cache().count()
    return cb


def _cb_dict(codebook):
    return {
        (r["sub"], r["code"]): [float(x) for x in r["codeword"]]
        for r in codebook.collect()
    }


def _fold_sq(a, b):
    """Sequential left fold of Σ(aᵢ−bᵢ)² — mirrors F.aggregate's order, so
    equality below is BIT-exact, not tolerance-based."""
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc = acc + d * d
    return acc


def _model_encode(vec, cb, m):
    sl = len(vec) // m
    code_packed, err = 0, 0.0
    for s in range(m):
        sub = [float(x) for x in vec[s * sl : (s + 1) * sl]]
        best = min(
            ((_fold_sq(sub, cb[(s, c)]), c) for c in range(PQ_K)
             if (s, c) in cb),
        )
        code_packed += best[1] * (_PACK_BASE ** s)
        err += best[0]
    return code_packed, err


def test_codebook_shape(codebook):
    rows = codebook.collect()
    assert len(rows) == PQ_M * PQ_K
    assert len({(r["sub"], r["code"]) for r in rows}) == PQ_M * PQ_K
    assert all(len(r["codeword"]) == 64 // PQ_M for r in rows)


def test_train_is_partitioning_invariant(spark, emb, codebook):
    again = pq_train(emb.repartition(7))
    a = {(r["sub"], r["code"]): list(r["codeword"]) for r in codebook.collect()}
    b = {(r["sub"], r["code"]): list(r["codeword"]) for r in again.collect()}
    assert a == b  # decimal-exact means: bit-identical across partitionings


def test_encode_matches_python_model_bit_exactly(emb, codebook):
    cb = _cb_dict(codebook)
    got = {r["vec_id"]: (r["pq_code"], r["sq_err"])
           for r in pq_encode(emb, codebook).collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert set(got) == set(vecs)
    for vid, vec in vecs.items():
        code, err = _model_encode(vec, cb, PQ_M)
        assert got[vid][0] == code, vid
        assert got[vid][1] == err, vid  # sequential fold: exact equality


def test_unpack_inverts_pack(spark):
    packed = sum(c * (_PACK_BASE ** s) for s, c in enumerate([3, 0, 255, 17]))
    df = spark.range(1).select(
        *[
            unpack_code(F.lit(packed), F.lit(s)).alias(f"c{s}")
            for s in range(4)
        ]
    )
    r = df.collect()[0]
    assert [r[f"c{s}"] for s in range(4)] == [3, 0, 255, 17]


def test_unpack_exact_beyond_double_mantissa(spark):
    """An m=8 pack exceeds 53 bits; `/`-based unpacking rounded it through a
    double and decoded the wrong low codes (review finding) — shiftright
    must invert it exactly at the widest legal pack."""
    codes = [3, 0, 101, 17, 9, 88, 126, 127]  # max legal high code at m=8
    packed = sum(c * (_PACK_BASE ** s) for s, c in enumerate(codes))
    assert packed > 2 ** 53  # the regression regime
    assert packed <= 2 ** 63 - 1
    r = spark.range(1).select(
        *[unpack_code(F.lit(packed), F.lit(s)).alias(f"c{s}") for s in range(8)]
    ).collect()[0]
    assert [r[f"c{s}"] for s in range(8)] == codes


def test_pack_bound_rejects_signed_overflow(spark, emb):
    # the classic unsigned M=8,K=256 layout does not fit a signed int64
    with pytest.raises(ValueError, match="cannot pack"):
        pq_train(emb, m=8, k=256)
    # but the documented operating points are accepted by the bound check
    from hbase_observer_es_spark.operators.pq import _check_mk

    _check_mk(8, 128)
    _check_mk(7, 256)


def test_codebook_m_mismatch_fails_loud(emb, codebook):
    """An inner join against a codebook trained at a different m silently
    dropped the uncovered subspaces (review finding)."""
    with pytest.raises(ValueError, match="codebook covers"):
        pq_encode(emb, codebook, m=8)
    with pytest.raises(ValueError, match="codebook covers"):
        pq_adc_topk([0.0] * 64, pq_encode(emb, codebook), codebook, m=8)
    # right subspace set but wrong codeword lengths: the row-level guard
    truncated = codebook.select(
        "sub", "code", F.slice("codeword", 1, 3).alias("codeword")
    )
    with pytest.raises(Exception, match="does not match the codebook"):
        pq_encode(emb, truncated).collect()


def test_adc_equals_reconstruction_distance(emb, codebook):
    """ADC's table-lookup sum IS the squared L2 between the probe and each
    vector's reconstruction — exact, by construction, bit-for-bit."""
    cb = _cb_dict(codebook)
    codes = pq_encode(emb, codebook)
    probe = [float(x) for x in emb.filter("vec_id = 7").collect()[0]["embedding"]]
    got = {r["vec_id"]: r["adc_sqdist"]
           for r in pq_adc_topk(probe, codes, codebook, top_k=20).collect()}
    packed = {r["vec_id"]: r["pq_code"] for r in codes.collect()}
    sl = len(probe) // PQ_M
    for vid, adc in got.items():
        want = 0.0
        for s in range(PQ_M):
            c = (packed[vid] // (_PACK_BASE ** s)) % _PACK_BASE
            want += _fold_sq(probe[s * sl : (s + 1) * sl], cb[(s, c)])
        assert adc == want, vid


def test_adc_topk_total_order_and_self_recall(emb, codebook):
    codes = pq_encode(emb, codebook)
    for vid in (0, 7, 31):
        probe = [float(x) for x in
                 emb.filter(f"vec_id = {vid}").collect()[0]["embedding"]]
        rows = pq_adc_topk(probe, codes, codebook, top_k=5).collect()
        ds = [r["adc_sqdist"] for r in rows]
        assert ds == sorted(ds)
        # the probe's own vector quantizes closest to itself
        assert rows[0]["vec_id"] == vid


def test_ivfpq_full_probe_equals_flat_adc(spark, emb, codebook):
    """nprobe = all cells must reproduce flat ADC exactly — the IVF layer
    prunes, it never rescores."""
    from hbase_observer_es_spark.operators.pq import pq_ivf_index, pq_ivfadc_topk
    from hbase_observer_es_spark.operators.similarity import train_centroids

    cent = train_centroids(emb.select("vec_id", "embedding"))
    cent.cache().count()
    index = pq_ivf_index(emb, cent, codebook)
    assert index.columns == ["cell", "vec_id", "pq_code"]
    assert index.count() == emb.count()  # every vector lands in one cell
    probe = [float(x) for x in emb.filter("vec_id = 3").collect()[0]["embedding"]]
    n_cells = cent.count()
    flat = pq_adc_topk(probe, pq_encode(emb, codebook), codebook, top_k=10)
    ivf = pq_ivfadc_topk(
        probe, index, cent, codebook, top_k=10, nprobe=n_cells
    )
    assert [tuple(r) for r in ivf.collect()] == [tuple(r) for r in flat.collect()]
    # pruned serving still finds the probe's own vector with a cell budget
    narrow = pq_ivfadc_topk(probe, index, cent, codebook, top_k=5, nprobe=2)
    assert narrow.collect()[0]["vec_id"] == 3
    with pytest.raises(ValueError, match="nprobe"):
        pq_ivfadc_topk(probe, index, cent, codebook, nprobe=0)


def test_pq_recall_measures_the_compression_tradeoff(spark, emb, codebook):
    """Recall@K against exact L2 truth: flat ADC on this structured fixture
    recovers most of the exact neighborhood, and the harness's bookkeeping
    (n_hits <= K, recall in [0,1], one row per probe) holds."""
    from hbase_observer_es_spark.operators.pq import pq_recall

    rows = pq_recall(emb, codebook, top_k=10, probe_mod=50).collect()
    assert len(rows) == emb.filter("vec_id % 50 = 0").count()
    assert all(0 <= r["n_hits"] <= 10 for r in rows)
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    # the fixture's near-random unit vectors quantize coarsely at m=4,k=16
    # (mean sq_err ≈ 0.74 on |v|²=1) — the meaningful bar is the CHANCE
    # baseline K/(N−1) ≈ 0.02, which the codes must beat decisively; no
    # RNG anywhere, so the measured value is rerun-stable, not flaky
    n = emb.count()
    chance = 10 / (n - 1)
    assert mean_recall >= 5 * chance, (mean_recall, chance)
    # monotonicity: a richer codebook must not lose recall (k=16 → k=64
    # measured 0.14 → 0.22 here; deterministic, so pinned as a floor)
    from hbase_observer_es_spark.operators.pq import pq_train

    rich = pq_train(emb, k=64)
    rows64 = pq_recall(emb, rich, top_k=10, probe_mod=50).collect()
    mean64 = sum(r["recall"] for r in rows64) / len(rows64)
    assert mean64 > mean_recall, (mean64, mean_recall)
    with pytest.raises(ValueError, match="probe_mod"):
        pq_recall(emb, codebook, probe_mod=0)


def test_pq_recall_ivf_branch(spark, emb, codebook):
    """The IVF serving path through the recall harness: with nprobe = all
    cells it equals the flat-ADC recall exactly (the pruning layer is a
    no-op at full budget), and a pruned budget still returns a full,
    bounded result frame."""
    from hbase_observer_es_spark.operators.pq import pq_recall
    from hbase_observer_es_spark.operators.similarity import train_centroids

    cent = train_centroids(emb.select("vec_id", "embedding"))
    cent.cache().count()
    n_cells = cent.count()
    flat = {r["probe_id"]: (r["n_hits"], r["recall"])
            for r in pq_recall(emb, codebook, top_k=5, probe_mod=100).collect()}
    full = {r["probe_id"]: (r["n_hits"], r["recall"])
            for r in pq_recall(
                emb, codebook, centroids=cent, top_k=5, probe_mod=100,
                nprobe=n_cells,
            ).collect()}
    assert full == flat
    pruned = pq_recall(
        emb, codebook, centroids=cent, top_k=5, probe_mod=100, nprobe=1
    ).collect()
    assert len(pruned) == len(flat)
    assert all(0.0 <= r["recall"] <= 1.0 for r in pruned)


def test_q_embed_pq_matches_duckdb_oracle(spark):
    """The registration-ready twin: Spark train→encode vs the CTE-replay SQL
    oracle, hash-compared the way the driver would (row count + schema +
    value hash). Green here means r11 registration is one registry row."""
    from hbase_observer_es_spark.operators.pq import SQL_EMBED_PQ, q_embed_pq

    from .oracle_harness import compare, duckdb_con

    con = duckdb_con(SF)
    r = compare("q_embed_pq", q_embed_pq(spark, SF), con, SQL_EMBED_PQ)
    assert r.ok, r.detail


def test_trained_codebook_check_fast_path(spark, emb, codebook):
    """r16 optimization: pq_train validates coverage on the driver (the rows
    are already collected) and tags the literal frame, so pq_encode skips
    the 64-row Spark-job check. The tag must be m-specific and absent from
    foreign frames — the real check still guards both."""
    from hbase_observer_es_spark.operators.pq import _check_codebook

    # trained codebook carries the m it was validated against
    assert getattr(codebook, "_hoes_codebook_checked_m", None) == PQ_M
    _check_codebook(codebook, PQ_M)  # fast path: must not raise
    # the tag does NOT satisfy a different m — the real check fires and rejects
    with pytest.raises(ValueError, match="needs exactly 0..1"):
        _check_codebook(codebook, 2)
    # a hand-built (foreign, untagged) frame with a coverage hole fails loud
    holey = spark.createDataFrame(
        [(0, 0, [1.0, 2.0]), (2, 0, [3.0, 4.0])],
        "sub int, code int, codeword array<double>",
    )
    with pytest.raises(ValueError, match="covers 2 subspaces"):
        _check_codebook(holey, 3)
    # degenerate training input: the driver-side check raises at TRAIN time
    empty = emb.filter(F.col("vec_id") < 0).select("vec_id", "embedding")
    with pytest.raises(ValueError, match="covers 0 subspaces"):
        pq_train(empty)


def test_validation_fails_loud(spark, emb, codebook):
    with pytest.raises(ValueError, match="m must be"):
        pq_train(emb, m=9)
    with pytest.raises(ValueError, match="k must be"):
        pq_train(emb, k=1)
    with pytest.raises(Exception, match="not divisible"):
        pq_train(emb, m=3).collect()
    with pytest.raises(ValueError, match="probe dimension"):
        pq_adc_topk([1.0, 2.0, 3.0], pq_encode(emb, codebook), codebook, m=2)

def test_pandas_code_assigner_matches_jvm(spark, emb, codebook):
    """r17 optimization: the train loop's assignment runs through the
    vectorized pandas assigner. It must agree with the JVM fold argmin
    (_nearest_code) on every (vec, sub) — BIT-exact distances, same
    ties-to-lowest-code rule — or training would drift from the DuckDB
    codebook-replay oracle."""
    from hbase_observer_es_spark.operators.pq import (
        _make_code_assigner,
        _nearest_code,
        _subvectors,
    )

    subs = _subvectors(emb, PQ_M)
    jvm = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in _nearest_code(subs, codebook).collect()
    }
    assign = _make_code_assigner(_cb_dict(codebook))
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in subs.select(
            "vec_id", "sub", assign(F.col("sub"), F.col("subvec")).alias("code")
        ).collect()
    }
    assert jvm == got
