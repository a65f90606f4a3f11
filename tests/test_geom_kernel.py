"""Unit tests for the pure-numpy WKB serde + predicate kernel."""

import numpy as np
import pytest

from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.geom import kernel as K


def test_wkb_point_roundtrip():
    g = W.point(1.5, -2.25)
    assert W.loads(W.dumps(g)).vertices().tolist() == [[1.5, -2.25]]
    assert W.dumps(g)[0] == 1 and len(W.dumps(g)) == 21


def test_wkb_polygon_roundtrip_with_hole():
    g = W.polygon(
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]],
    )
    g2 = W.loads(W.dumps(g))
    assert g2.kind == W.POLYGON and len(g2.parts) == 2
    assert g2.bounds == (0, 0, 10, 10)


def test_wkb_multipolygon_and_linestring():
    mp = W.multi(W.MULTIPOLYGON, [W.box(0, 0, 1, 1), W.box(5, 5, 6, 6)])
    g2 = W.loads(W.dumps(mp))
    assert g2.kind == W.MULTIPOLYGON and g2.bounds == (0, 0, 6, 6)
    ls = W.linestring([(0, 0), (1, 1), (2, 0)])
    assert W.loads(W.dumps(ls)).edges().shape == (2, 4)


def test_vectorized_point_paths():
    x = np.array([0.0, 1.5, -3.25])
    y = np.array([2.0, -1.0, 0.5])
    bufs = W.points_to_wkb(x, y)
    pts = W.wkb_to_points(bufs)
    assert np.allclose(pts, np.column_stack([x, y]))
    bb = W.bounds_batch(bufs)
    assert np.allclose(bb[:, 0], x) and np.allclose(bb[:, 3], y)


def test_point_in_polygon_basic():
    poly = W.box(0, 0, 10, 10)
    pts = np.array([[5, 5], [10, 5], [0, 0], [11, 5], [-1, -1]])
    inside, bnd = K.point_in_polygon(poly, pts)
    assert inside.tolist() == [True, False, False, False, False]
    assert bnd.tolist() == [False, True, True, False, False]


def test_point_in_polygon_hole():
    poly = W.polygon(
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]],
    )
    inside, bnd = K.point_in_polygon(poly, np.array([[5, 5], [3, 3], [4, 5]]))
    assert inside.tolist() == [False, True, False]
    assert bnd.tolist() == [False, False, True]


@pytest.mark.parametrize(
    "name,a,b,expected",
    [
        ("contains", W.box(0, 0, 10, 10), W.point(5, 5), True),
        ("contains", W.box(0, 0, 10, 10), W.point(10, 10), False),  # boundary: JTS contains=False
        ("covers", W.box(0, 0, 10, 10), W.point(10, 10), True),
        ("intersects", W.box(0, 0, 10, 10), W.point(10, 10), True),
        ("intersects", W.box(0, 0, 5, 5), W.box(5, 5, 9, 9), True),  # corner touch
        ("intersects", W.box(0, 0, 5, 5), W.box(6, 6, 9, 9), False),
        ("touches", W.box(0, 0, 5, 5), W.box(5, 0, 9, 5), True),
        ("touches", W.box(0, 0, 5, 5), W.box(4, 0, 9, 5), False),
        ("contains", W.box(0, 0, 10, 10), W.box(2, 2, 4, 4), True),
        ("contains", W.box(0, 0, 10, 10), W.box(2, 2, 14, 4), False),
        ("covers", W.box(0, 0, 10, 10), W.box(0, 0, 10, 10), True),
        ("within", W.box(2, 2, 4, 4), W.box(0, 0, 10, 10), True),
        ("equals", W.box(1, 1, 2, 2), W.box(1, 1, 2, 2), True),
        ("equals", W.box(1, 1, 2, 2), W.box(1, 1, 2, 3), False),
        ("overlaps", W.box(0, 0, 5, 5), W.box(3, 3, 8, 8), True),
        ("overlaps", W.box(0, 0, 5, 5), W.box(1, 1, 2, 2), False),  # contained, not overlap
        ("disjoint", W.box(0, 0, 1, 1), W.box(2, 2, 3, 3), True),
        ("crosses", W.linestring([(-1, 5), (11, 5)]), W.box(0, 0, 10, 10), True),
        ("crosses", W.linestring([(0, 0), (1, 1)]), W.linestring([(0, 1), (1, 0)]), True),
        ("intersects", W.linestring([(0, 0), (2, 2)]), W.linestring([(2, 2), (3, 0)]), True),
        (
            "contains",
            W.polygon([(0, 0), (10, 0), (10, 10), (0, 10)], holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]]),
            W.point(5, 5),
            False,  # inside the hole
        ),
    ],
)
def test_predicate_pairs(name, a, b, expected):
    assert K.predicate_pair(name, a, b) is bool(expected) or K.predicate_pair(name, a, b) == expected


def test_distance_pair():
    assert K.distance_pair(W.point(0, 0), W.point(3, 4)) == pytest.approx(5.0)
    assert K.distance_pair(W.point(5, 5), W.box(0, 0, 10, 10)) == 0.0
    assert K.distance_pair(W.point(12, 5), W.box(0, 0, 10, 10)) == pytest.approx(2.0)
    assert K.distance_pair(W.box(0, 0, 1, 1), W.box(4, 1, 5, 2)) == pytest.approx(3.0)


def test_eval_predicate_batch_poly_vs_points():
    poly1, poly2 = W.dumps(W.box(0, 0, 10, 10)), W.dumps(W.box(20, 20, 30, 30))
    pts = W.points_to_wkb(np.array([5.0, 25.0, 15.0]), np.array([5.0, 25.0, 15.0]))
    got = K.eval_predicate_batch("contains", [poly1, poly2, poly1], pts)
    assert got.tolist() == [True, True, False]
    # inverse orientation: point within polygon
    got = K.eval_predicate_batch("within", pts, [poly1, poly2, poly1])
    assert got.tolist() == [True, True, False]


def test_distance_batch_points():
    l = W.points_to_wkb(np.array([0.0, 0.0]), np.array([0.0, 0.0]))
    r = W.points_to_wkb(np.array([3.0, 1.0]), np.array([4.0, 0.0]))
    assert np.allclose(K.distance_batch(l, r), [5.0, 1.0])


# -- property-based serde fuzz (round 3) --------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    width=64,
)


@st.composite
def _geometries(draw):
    kind = draw(st.sampled_from(["point", "linestring", "polygon", "multipoint"]))
    if kind == "point":
        return W.point(draw(_coord), draw(_coord))
    if kind == "linestring":
        pts = draw(st.lists(st.tuples(_coord, _coord), min_size=2, max_size=12))
        return W.linestring(pts)
    if kind == "multipoint":
        pts = draw(st.lists(st.tuples(_coord, _coord), min_size=1, max_size=8))
        return W.multi(W.MULTIPOINT, [W.point(*p) for p in pts])
    # polygon: closed ring from >=3 distinct corners (validity not required
    # for serde roundtrips)
    pts = draw(st.lists(st.tuples(_coord, _coord), min_size=3, max_size=10))
    ring = pts + [pts[0]]
    return W.polygon(ring)


@settings(max_examples=200, deadline=None)
@given(_geometries())
def test_wkb_serde_roundtrip_property(g):
    """dumps/loads is the identity on kind, structure and coordinates for
    arbitrary finite-coordinate geometries."""
    g2 = W.loads(W.dumps(g))
    assert g2.kind == g.kind
    assert np.array_equal(g2.vertices(), g.vertices())
    assert g2.bounds == g.bounds


@settings(max_examples=100, deadline=None)
@given(_geometries())
def test_wkt_roundtrip_property(g):
    """WKT write -> parse preserves coordinates exactly (full-precision
    repr-based writer)."""
    from incubator_sedona_spark.functions.st import _parse_wkt, _to_wkt

    g2 = _parse_wkt(_to_wkt(g))
    assert g2.kind == g.kind
    assert np.array_equal(g2.vertices(), g.vertices())


# coordinates on a 1e-5 grid — 100x FINER than the pre-round-4 documented
# feature floor (~1e-7 relative): separations down to 1e-5 abs on a ~200
# extent now exercise the probe-hazard detector + snap-rounding fallback in
# clip.py; exactly-coincident edges remain the always-supported case
_box_c = st.integers(min_value=-10_000_000, max_value=10_000_000).map(
    lambda v: v / 100_000.0
)


@st.composite
def _boxes(draw):
    x0, x1 = sorted((draw(_box_c), draw(_box_c)))
    y0, y1 = sorted((draw(_box_c), draw(_box_c)))
    return W.box(x0, y0, x1 + 1.0, y1 + 1.0)  # non-degenerate


@settings(max_examples=150, deadline=None)
@given(_boxes(), _boxes())
def test_predicate_algebra_properties(a, b):
    """Predicate algebra on random rectangles: symmetry, inversion and
    implication laws the reference's SpatialPredicate.inverse() encodes."""
    import incubator_sedona_spark.geom.kernel as KK

    p = KK.predicate_pair
    assert p("intersects", a, b) == p("intersects", b, a)
    assert p("disjoint", a, b) == (not p("intersects", a, b))
    assert p("contains", a, b) == p("within", b, a)
    assert p("covers", a, b) == p("coveredby", b, a)
    if p("contains", a, b):
        assert p("covers", a, b)  # contains implies covers
    if p("equals", a, b):
        assert p("covers", a, b) and p("coveredby", a, b)


@settings(max_examples=80, deadline=None)
@given(_boxes(), _boxes())
def test_overlay_inclusion_exclusion_property(a, b):
    """area(A) + area(B) == area(A∪B) + area(A∩B) for random rectangles,
    and the intersection area equals the closed-form box overlap."""
    from incubator_sedona_spark.geom.clip import overlay_geoms

    def area(g):
        tot = 0.0
        for leaf in g.leaves():
            for i, r in enumerate(leaf.parts):
                s = 0.0
                for k in range(len(r) - 1):
                    s += r[k][0] * r[k + 1][1] - r[k + 1][0] * r[k][1]
                tot += abs(s) / 2 * (1 if i == 0 else -1)
        return tot

    ax0, ay0, ax1, ay1 = a.bounds
    bx0, by0, bx1, by1 = b.bounds
    ow = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    oh = max(0.0, min(ay1, by1) - max(ay0, by0))
    a_area = (ax1 - ax0) * (ay1 - ay0)
    b_area = (bx1 - bx0) * (by1 - by0)
    inter = area(overlay_geoms(a, b, "intersection"))
    union = area(overlay_geoms(a, b, "union"))
    tol = 1e-6 * max(a_area + b_area, 1.0)
    assert abs(inter - ow * oh) < tol
    assert abs(a_area + b_area - union - inter) < tol


def test_overlay_exactly_coincident_edges():
    """Regression: boxes sharing edges exactly (nested sharing 3 edges,
    partial overlap sharing sides, side-by-side) — the supported coincident
    case the robustness model promises."""
    from incubator_sedona_spark.geom.clip import overlay_geoms

    def area(g):
        tot = 0.0
        for leaf in g.leaves():
            for i, r in enumerate(leaf.parts):
                s = 0.0
                for k in range(len(r) - 1):
                    s += r[k][0] * r[k + 1][1] - r[k + 1][0] * r[k][1]
                tot += abs(s) / 2 * (1 if i == 0 else -1)
        return tot

    cases = [
        (W.box(0, 0, 1, 14), W.box(0, 0, 1, 27), 14.0, 27.0),
        (W.box(0, 0, 1, 8), W.box(0, -1, 1, 1), 1.0, 9.0),
        (W.box(0, 0, 2, 2), W.box(0, 0, 2, 4), 4.0, 8.0),
        (W.box(0, 0, 2, 2), W.box(1, 0, 3, 2), 2.0, 6.0),
    ]
    for a, b, want_i, want_u in cases:
        assert area(overlay_geoms(a, b, "intersection")) == pytest.approx(want_i)
        assert area(overlay_geoms(a, b, "union")) == pytest.approx(want_u)
