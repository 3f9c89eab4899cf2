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


@given(st.integers(min_value=4, max_value=NEAR_BITS))
@settings(max_examples=60)
def test_hamming_banding_sharp_at_bands(d):
    """The guarantee is sharp: at distance ≥ HAM_BANDS one flip per band evades
    every bucket — documents why HAM_MAX is 3 and not 4."""
    if d < HAM_BANDS:
        return
    fp = 0
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


@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        min_size=EMB_DIM,
        max_size=EMB_DIM,
    )
)
@settings(max_examples=100)
def test_lsh_identical_vectors_always_collide(vec):
    """A vector always lands in its own bucket on every band: sign(w·v) is a
    pure function, so exact duplicates can never be missed — the property that
    makes LSH a sound DEDUP primitive even though neighbor recall is
    probabilistic."""
    sigs = [sum(w * x for w, x in zip(_lsh_weights(p), vec)) >= 0
            for p in range(LSH_PLANES)]
    assert sigs == [sum(w * x for w, x in zip(_lsh_weights(p), vec)) >= 0
                    for p in range(LSH_PLANES)]
