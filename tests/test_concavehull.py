"""ST_ConcaveHull (Delaunay chi-shape)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.functions.concavehull import concave_hull_rings, delaunay, st_concave_hull
from incubator_sedona_spark.functions.st import _convex_hull
from incubator_sedona_spark.geom import kernel as K
from incubator_sedona_spark.geom import wkb as W


def _area(r):
    return abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]) / 2)


def test_delaunay_empty_circumcircles():
    rng = np.random.default_rng(1)
    p = rng.uniform(0, 100, (60, 2))
    tris = delaunay(p)
    assert len(tris) > 100  # ~2n triangles
    for t in tris:
        a, b, c = p[t[0]], p[t[1]], p[t[2]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1]) + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0]) + (c @ c) * (b[0] - a[0])) / d
        r = np.hypot(*(a - np.array([ux, uy])))
        dist = np.hypot(p[:, 0] - ux, p[:, 1] - uy)
        assert (dist < r - 1e-7).sum() == 0


def test_ratio_one_equals_convex_hull():
    t = np.linspace(0.3, 2 * np.pi - 0.3, 80)
    pts = np.column_stack([50 + 40 * np.cos(t), 50 + 40 * np.sin(t)])
    rings = concave_hull_rings(pts, 1.0)
    ch = _convex_hull(pts)
    ch = np.vstack([ch, ch[:1]])
    assert _area(rings[0]) == pytest.approx(_area(ch), rel=1e-6)


def test_concave_hull_carves_and_covers():
    rng = np.random.default_rng(2)
    xs, ys = rng.uniform(0, 10, 800), rng.uniform(0, 10, 800)
    m = (xs < 3) | (xs > 7) | (ys < 3)  # U-shaped cloud
    pts = np.column_stack([xs[m], ys[m]])
    rings = concave_hull_rings(pts, 0.2)
    ch = _convex_hull(pts)
    ch = np.vstack([ch, ch[:1]])
    assert _area(rings[0]) < 0.9 * _area(ch)  # carved into the notch
    g = W.Geometry(W.POLYGON, rings)
    inside, bnd = K.point_in_polygon(g, pts)
    assert (inside | bnd).all()  # chi-shape always contains its points


def test_st_concave_hull_column(spark):
    t = np.linspace(0.3, 2 * np.pi - 0.3, 60)
    pts = np.column_stack([50 + 40 * np.cos(t), 50 + 40 * np.sin(t)])
    mp = W.multi(W.MULTIPOINT, [W.point(x, y) for x, y in pts])
    df = spark.createDataFrame([(bytearray(W.dumps(mp)),)], "wkb binary")
    from incubator_sedona_spark.functions.st import st_area

    row = df.select(st_area(st_concave_hull(F.col("wkb"), 0.3)).alias("a")).first()
    assert row.a > 0
