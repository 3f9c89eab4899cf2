"""Property tests for the LSH banding guarantees — pure-Python pigeonhole
checks of the invariants the Spark operators rely on (no Spark session needed).

The banded candidate generators (q_dedup_simhash_near, q_sim_lsh, MinHash LSH)
are only correct-as-specified if their band layouts deliver the recall their
docstrings promise; these tests pin the combinatorics with hypothesis.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.dedup import (
    HAM_BANDS,
    HAM_BAND_BITS,
    HAM_MAX,
    NEAR_BITS,
)
from hbase_observer_es_spark.operators.similarity import (
    EMB_DIM,
    LSH_BANDS,
    LSH_BAND_BITS,
    LSH_PLANES,
    _lsh_weights,
)


def _bands(x: int) -> list[int]:
    return [
        (x >> (b * HAM_BAND_BITS)) & ((1 << HAM_BAND_BITS) - 1)
        for b in range(HAM_BANDS)
    ]


@given(
    st.integers(min_value=0, max_value=(1 << NEAR_BITS) - 1),
    st.sets(st.integers(min_value=0, max_value=NEAR_BITS - 1), max_size=HAM_MAX),
)
@settings(max_examples=300)
def test_hamming_banding_is_exact_for_max_distance(fp, flip):
    """Pigeonhole: flipping ≤ HAM_MAX bits of a NEAR_BITS fingerprint can touch
    at most HAM_MAX < HAM_BANDS bands, so at least one band survives intact —
    banded candidate generation has NO false negatives up to the promised
    distance. (This is why the operator is exact, not approximate, for d ≤ 3.)"""
    other = fp
    for bit in flip:
        other ^= 1 << bit
    assert any(a == b for a, b in zip(_bands(fp), _bands(other)))


@given(st.integers(min_value=0, max_value=(1 << NEAR_BITS) - 1))
@settings(max_examples=100)
def test_hamming_banding_sharp_at_bands(fp):
    """The guarantee is sharp: at distance HAM_BANDS, one flip per band evades
    every bucket — documents why HAM_MAX is HAM_BANDS−1 and not HAM_BANDS.
    Checked from an arbitrary starting fingerprint, not just zero."""
    other = fp
    for b in range(HAM_BANDS):  # one flipped bit inside each band
        other ^= 1 << (b * HAM_BAND_BITS)
    assert not any(a == b for a, b in zip(_bands(fp), _bands(other)))


def test_band_layout_covers_fingerprint_exactly():
    assert HAM_BANDS * HAM_BAND_BITS == NEAR_BITS
    assert LSH_BANDS * LSH_BAND_BITS == LSH_PLANES


def test_lsh_weights_deterministic_and_spread():
    """Hyperplane weights are a pure function of (plane, dim) — same list every
    call — and no plane is degenerate (all-zero or constant-sign), which would
    waste a signature bit."""
    for p in range(LSH_PLANES):
        w = _lsh_weights(p)
        assert w == _lsh_weights(p)
        assert len(w) == EMB_DIM
        assert any(x > 0 for x in w) and any(x < 0 for x in w)


def _py_bands(vec: list[float]) -> list[int]:
    """Independent Python mirror of _lsh_band_cols: left fold from 0.0 over
    per-dim products — the association order both engines use."""
    bits = []
    for p in range(LSH_PLANES):
        acc = 0.0
        for w, x in zip(_lsh_weights(p), vec):
            acc = acc + (x * w)
        bits.append(1 if acc >= 0 else 0)
    return [
        sum(bits[b * LSH_BAND_BITS + i] << i for i in range(LSH_BAND_BITS))
        for b in range(LSH_BANDS)
    ]


def test_lsh_spark_bands_match_python_mirror(spark):
    """The Spark-side signature (fold expressions over baked weight literals)
    must agree bit-for-bit with an independent Python computation — the parity
    that makes exact duplicates impossible to miss (same payload ⇒ same bucket
    on every band) and keeps the oracle's SQL mirror honest."""
    from pyspark.sql import functions as F

    from hbase_observer_es_spark.io import table
    from hbase_observer_es_spark.operators.similarity import _lsh_band_cols

    from .conftest import SF_ORACLE

    e = table(spark, SF_ORACLE, "embeddings").orderBy("vec_id").limit(20)
    rows = e.select(
        "vec_id", "embedding", *_lsh_band_cols("embedding")
    ).collect()
    assert rows
    for r in rows:
        expect = _py_bands([float(x) for x in r.embedding])
        got = [r[f"b{b}"] for b in range(LSH_BANDS)]
        assert got == expect, r.vec_id
