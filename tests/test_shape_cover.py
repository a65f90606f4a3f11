"""Shape-following cell covering (Grid.cover_geometry + spatial_join left_cover).

Contract: the cover is a SUPERSET of cells intersecting the geometry (join
safety) while dropping the bbox cells a high-aspect geometry never touches
(candidate-count linearity at scale — reference S2 region covering analog)."""

import numpy as np
import pytest

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.geom import kernel as K
from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.operators.joins import spatial_join

GRID = Grid(0.0, 0.0, 100.01, 100.01, 5)


def _diag_poly():
    return W.Geometry(
        W.POLYGON,
        [np.array([(0, 0), (2, 0), (100, 98), (98, 100), (0, 2), (0, 0)], dtype=float)],
    )


def test_cover_superset_of_intersecting_cells():
    rng = np.random.default_rng(4)
    geoms = [_diag_poly()]
    for _ in range(15):
        pts = rng.uniform(0, 100, (3, 2))
        geoms.append(W.Geometry(W.POLYGON, [np.vstack([pts, pts[:1]])]))
    for g in geoms:
        shape = set(int(c) for c in GRID.cover_geometry(g))
        for c in GRID.cover_bbox(*g.bounds):
            cell = W.loads(W.dumps(W.box(*GRID.cell_bounds(int(c)))))
            if K.predicate_pair("intersects", g, cell):
                assert int(c) in shape


def test_cover_shrinks_diagonal():
    g = _diag_poly()
    shape = GRID.cover_geometry(g)
    bbox = GRID.cover_bbox(*g.bounds)
    assert len(bbox) >= 5 * len(shape)  # 1024 vs ~94 cells


def test_shape_cover_join_matches_bbox_cover(spark):
    rng = np.random.default_rng(9)
    xs, ys = rng.uniform(0, 100, 2000), rng.uniform(0, 100, 2000)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "pid int, x double, y double",
    )
    zones = spark.createDataFrame(
        [(0, bytearray(W.dumps(_diag_poly())))], "zid int, wkb binary"
    )
    base = spatial_join(zones, pts, "contains", grid=GRID, right_point_cols=("x", "y"))
    shp = spatial_join(
        zones, pts, "contains", grid=GRID, right_point_cols=("x", "y"), left_cover="shape"
    )
    a = {(r.zid, r.pid) for r in base.collect()}
    b = {(r.zid, r.pid) for r in shp.collect()}
    assert a == b and len(a) > 0


def test_shape_cover_requires_point_right(spark):
    zones = spark.createDataFrame([(0, bytearray(W.dumps(_diag_poly())))], "zid int, wkb binary")
    with pytest.raises(ValueError):
        spatial_join(zones, zones, "intersects", grid=GRID, left_cover="shape")
