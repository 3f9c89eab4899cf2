"""Property test for the geo_shape relation algebra (operators/nested_geo.py):
the per-axis 1-D interval decomposition used by q_geo_shape_relation must
agree with the direct set-theoretic 2-D definitions on random integer boxes.
Pure Python — the operator's Spark/SQL twins are both generated from this
same per-axis algebra, so pinning the algebra to the set definitions pins
them both."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _box(draw_lo, draw_hi):
    return st.tuples(draw_lo, draw_hi).map(lambda t: (min(t), max(t)))


_coord = st.integers(min_value=-50, max_value=50)
_boxes = st.tuples(_box(_coord, _coord), _box(_coord, _coord))  # (lat, lon)


def _cells(box):
    """The box as a set of integer cells (closed intervals, inclusive
    boundaries — the ES envelope-edge rule the operator documents)."""
    (lat_lo, lat_hi), (lon_lo, lon_hi) = box
    return {
        (la, lo)
        for la in range(lat_lo, lat_hi + 1)
        for lo in range(lon_lo, lon_hi + 1)
    }


def _axis_relations(doc, probe):
    """The operator's algebra: per-axis interval tests, conjoined."""
    (dlat, dlon), (plat, plon) = doc, probe

    def axis(d, p):
        return {
            "intersects": d[0] <= p[1] and d[1] >= p[0],
            "within": d[0] >= p[0] and d[1] <= p[1],
            "contains": d[0] <= p[0] and d[1] >= p[1],
        }

    a, b = axis(dlat, plat), axis(dlon, plon)
    return {k: a[k] and b[k] for k in a}


@given(doc=_boxes, probe=_boxes)
@settings(max_examples=500, deadline=None)
def test_per_axis_algebra_matches_set_definitions(doc, probe):
    rel = _axis_relations(doc, probe)
    dc, pc = _cells(doc), _cells(probe)
    assert rel["intersects"] == bool(dc & pc)
    assert rel["within"] == (dc <= pc)
    assert rel["contains"] == (dc >= pc)


@given(doc=_boxes, probe=_boxes)
@settings(max_examples=200, deadline=None)
def test_relation_implications(doc, probe):
    """Structural sanity: within ⇒ intersects, contains ⇒ intersects (boxes
    are non-empty under the closed-interval convention)."""
    rel = _axis_relations(doc, probe)
    if rel["within"] or rel["contains"]:
        assert rel["intersects"]
