"""Property tests for the geo_polygon crossing-number algebra
(operators/nested_geo.py): the division-free per-edge terms that both the
Spark predicate and the DuckDB oracle are generated from must agree with
the CLASSIC PNPOLY ray cast computed in exact rational arithmetic — an
independent formulation (Fraction x-intersection comparison vs integer
cross-product sign), so a sign or straddle mistake in the rearrangement
cannot hide. Pure Python: pinning the shared algebra pins both engines.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.nested_geo import (
    GEO_POLYGON,
    point_in_polygon,
)


def _ref_pnpoly(py: int, px: int, poly) -> bool:
    """The textbook PNPOLY form: half-open y straddle, exact-rational
    x-intersection, strict comparison."""
    inside = False
    n = len(poly)
    for i in range(n):
        ay, ax = poly[i]
        by, bx = poly[(i + 1) % n]
        if (ay > py) != (by > py):
            xint = Fraction((bx - ax) * (py - ay), (by - ay)) + ax
            if px < xint:
                inside = not inside
    return inside


_coord = st.integers(min_value=-20, max_value=20)
_vertex = st.tuples(_coord, _coord)
_poly = st.lists(_vertex, min_size=3, max_size=8).map(tuple)


@given(py=_coord, px=_coord, poly=_poly)
@settings(max_examples=1000, deadline=None)
def test_algebra_matches_rational_pnpoly(py, px, poly):
    """Random small-range polygons (degenerate, self-intersecting, and
    repeated-vertex shapes included) and points dense enough to land ON
    vertices and edges constantly — the even-odd parity must match the
    reference everywhere, boundary conventions included."""
    assert point_in_polygon(py, px, poly) == _ref_pnpoly(py, px, poly)


@given(
    py=st.integers(min_value=-9000, max_value=8999),
    px=st.integers(min_value=-18000, max_value=17999),
)
@settings(max_examples=500, deadline=None)
def test_query_polygon_matches_reference(py, px):
    """The fixed query polygon over the full derived-coordinate domain."""
    assert point_in_polygon(py, px) == _ref_pnpoly(py, px, GEO_POLYGON)


def test_known_points_of_the_query_polygon():
    """Deterministic anchors: deep inside, far outside, and the boundary
    convention on an axis-parallel probe square."""
    assert point_in_polygon(0, -6000)  # inside the western lobe
    assert not point_in_polygon(8500, 0)  # north of everything
    assert not point_in_polygon(0, 15000)  # east of everything
    # reflex pocket: (1000, 0) is a vertex pulling the boundary inward;
    # a point just east of the pocket vertex sits OUTSIDE the polygon
    # even though the polygon's bbox contains it
    assert not point_in_polygon(3000, 2000) == point_in_polygon(3000, -2000)
    # unit-square convention: left edge in, right edge out (PNPOLY)
    sq = ((0, 0), (10, 0), (10, 10), (0, 10))  # (lat, lon) square
    assert point_in_polygon(5, 0, sq)  # on the left (west) edge
    assert not point_in_polygon(5, 10, sq)  # on the right (east) edge
    assert point_in_polygon(5, 5, sq)
    assert not point_in_polygon(15, 5, sq)
