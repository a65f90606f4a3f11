"""General polygon overlay kernel (geom/clip.py) + dissolving union aggregate.

Golden cases mirror the reference's functionTestScala overlay coverage
(ST_Intersection/Union/Difference/SymDifference, Catalog.scala:72-75) for
concave, holed, adjacent and identical operands, plus a randomized
integer-rectangle stress checked against a raster (unit-cell) oracle.
"""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.functions import overlay as O
from incubator_sedona_spark.geom import clip as C
from incubator_sedona_spark.geom import wkb as W


def _box_rings(x0, y0, x1, y1):
    return [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], dtype=float)]


def _area(rings):
    g = C.rings_to_geometry(rings, 1e-7)
    a = 0.0
    for leaf in g.leaves():
        if leaf.kind == W.POLYGON:
            sh = leaf.parts[0]
            a += abs(np.sum(sh[:-1, 0] * sh[1:, 1] - sh[1:, 0] * sh[:-1, 1]) / 2)
            for h in leaf.parts[1:]:
                a -= abs(np.sum(h[:-1, 0] * h[1:, 1] - h[1:, 0] * h[:-1, 1]) / 2)
    return a


def test_overlapping_squares_all_ops():
    A, B = _box_rings(0, 0, 10, 10), _box_rings(5, 5, 15, 15)
    assert _area(C.overlay_rings(A, B, "intersection")) == pytest.approx(25)
    assert _area(C.overlay_rings(A, B, "union")) == pytest.approx(175)
    assert _area(C.overlay_rings(A, B, "difference")) == pytest.approx(75)
    assert _area(C.overlay_rings(A, B, "symdifference")) == pytest.approx(150)


def test_concave_l_shapes():
    L1 = [np.array([(0, 0), (6, 0), (6, 2), (2, 2), (2, 6), (0, 6), (0, 0)], dtype=float)]
    L2 = [np.array([(1, 1), (7, 1), (7, 3), (3, 3), (3, 7), (1, 7), (1, 1)], dtype=float)]
    assert _area(C.overlay_rings(L1, L2, "intersection")) == pytest.approx(9)
    assert _area(C.overlay_rings(L1, L2, "union")) == pytest.approx(31)


def test_holed_polygon_ops():
    donut = _box_rings(0, 0, 10, 10) + _box_rings(4, 4, 6, 6)
    box = _box_rings(3, 3, 7, 7)
    assert _area(C.overlay_rings(donut, box, "intersection")) == pytest.approx(12)
    assert _area(C.overlay_rings(donut, box, "union")) == pytest.approx(100)
    assert _area(C.overlay_rings(donut, box, "difference")) == pytest.approx(84)


def test_hole_creation_by_difference():
    # subtracting an interior square must yield a donut (shell + hole ring)
    got = C.overlay_rings(_box_rings(0, 0, 10, 10), _box_rings(4, 4, 6, 6), "difference")
    assert _area(got) == pytest.approx(96)
    g = C.rings_to_geometry(got, 1e-7)
    assert g.kind == W.POLYGON and len(g.parts) == 2  # shell + hole


def test_degenerate_adjacent_and_identical():
    A, B = _box_rings(0, 0, 10, 10), _box_rings(10, 0, 20, 10)
    assert _area(C.overlay_rings(A, B, "union")) == pytest.approx(200)
    assert C.overlay_rings(A, B, "intersection") == []
    assert _area(C.overlay_rings(A, A, "union")) == pytest.approx(100)
    assert C.overlay_rings(A, A, "symdifference") == []


def test_multipart_intersection():
    # horizontal band across a U-shape: two disjoint intersection parts
    U = [np.array([(0, 0), (10, 0), (10, 10), (8, 10), (8, 2), (2, 2), (2, 10), (0, 10), (0, 0)], dtype=float)]
    band = _box_rings(-1, 5, 11, 7)
    rings = C.overlay_rings(U, band, "intersection")
    assert _area(rings) == pytest.approx(8)
    g = C.rings_to_geometry(rings, 1e-7)
    assert g.kind == W.MULTIPOLYGON and len(g.parts) == 2


def test_rect_stress_vs_raster_oracle():
    rng = np.random.default_rng(0)
    ops = {
        "intersection": lambda a, b: a & b,
        "union": lambda a, b: a | b,
        "difference": lambda a, b: a & ~b,
        "symdifference": lambda a, b: a ^ b,
    }
    for _ in range(20):
        ax0, ay0 = rng.integers(0, 40, 2)
        aw, ah = rng.integers(5, 40, 2)
        bx0, by0 = rng.integers(0, 40, 2)
        bw, bh = rng.integers(5, 40, 2)
        A = _box_rings(ax0, ay0, ax0 + aw, ay0 + ah)
        B = _box_rings(bx0, by0, bx0 + bw, by0 + bh)
        g1 = np.zeros((90, 90), bool)
        g1[ax0:ax0 + aw, ay0:ay0 + ah] = True
        g2 = np.zeros((90, 90), bool)
        g2[bx0:bx0 + bw, by0:by0 + bh] = True
        for op, fn in ops.items():
            got = _area(C.overlay_rings(A, B, op))
            assert got == pytest.approx(fn(g1, g2).sum()), (op, (ax0, ay0, aw, ah), (bx0, by0, bw, bh))


def test_union_many_matches_raster():
    sets = [_box_rings(x, y, x + 24, y + 24) for x in range(0, 100, 20) for y in range(0, 100, 20)]
    grid = np.zeros((130, 130), bool)
    for x in range(0, 100, 20):
        for y in range(0, 100, 20):
            grid[x:x + 24, y:y + 24] = True
    assert _area(C.union_many(sets)) == pytest.approx(grid.sum())


def test_line_clip_to_polygon():
    line = W.Geometry(W.LINESTRING, np.array([(-5.0, 5.0), (15.0, 5.0)]))
    poly = W.loads(W.dumps(W.box(0.0, 0.0, 10.0, 10.0)))
    got = O.clip_line_to_polygon(line, poly)
    e = got.edges()
    assert float(np.hypot(e[:, 2] - e[:, 0], e[:, 3] - e[:, 1]).sum()) == pytest.approx(10.0)


def test_st_union_aggr_dissolves(spark):
    from incubator_sedona_spark.functions.st import st_area

    rows = [
        (bytearray(W.dumps(W.box(float(x), float(y), x + 24.0, y + 24.0))),)
        for x in range(0, 100, 20)
        for y in range(0, 100, 20)
    ]
    df = spark.createDataFrame(rows, "wkb binary")
    u = O.st_union_aggr(df)
    grid = np.zeros((130, 130), bool)
    for x in range(0, 100, 20):
        for y in range(0, 100, 20):
            grid[x:x + 24, y:y + 24] = True
    got = u.select(st_area(F.col("union_wkb")).alias("a")).first().a
    assert got == pytest.approx(grid.sum())


def test_st_overlay_columns_concave(spark):
    L1 = W.Geometry(W.POLYGON, [np.array([(0, 0), (6, 0), (6, 2), (2, 2), (2, 6), (0, 6), (0, 0)], dtype=float)])
    L2 = W.Geometry(W.POLYGON, [np.array([(1, 1), (7, 1), (7, 3), (3, 3), (3, 7), (1, 7), (1, 1)], dtype=float)])
    df = spark.createDataFrame([(bytearray(W.dumps(L1)), bytearray(W.dumps(L2)))], "a binary, b binary")
    from incubator_sedona_spark.functions.st import st_area

    row = df.select(
        st_area(O.st_intersection(F.col("a"), F.col("b"))).alias("i"),
        st_area(O.st_union(F.col("a"), F.col("b"))).alias("u"),
        st_area(O.st_difference(F.col("a"), F.col("b"))).alias("d"),
        st_area(O.st_sym_difference(F.col("a"), F.col("b"))).alias("s"),
    ).first()
    assert row.i == pytest.approx(9)
    assert row.u == pytest.approx(31)
    assert row.d == pytest.approx(11)
    assert row.s == pytest.approx(22)
