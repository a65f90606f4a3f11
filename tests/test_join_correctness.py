"""Join correctness contracts, translated from the reference test suite.

- 10x10-grid / 200-pair contract:
  /root/reference/python/tests/spatial_operator/test_join_query_correctness.py:189-262
- dedup stress (4 overlapping polygons x 1 window -> exactly 8 pairs):
  /root/reference/core/src/test/java/org/apache/sedona/core/spatialOperator/JoinQueryDeduplicationTest.java:52-75
- randomized brute-force oracle equivalence:
  /root/reference/sql/common/src/test/scala/org/apache/sedona/sql/SpatialJoinSuite.scala:203-246
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.geom import kernel as K
from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.operators.joins import distance_join, range_query, spatial_join

GRID = Grid(0.0, 0.0, 100.01, 100.01, 4)


def _zones_df(spark):
    rows = []
    for x in range(0, 100, 10):
        for y in range(0, 100, 10):
            for tag in ("a", "b"):  # duplicate windows, ids a:/b:
                rows.append((f"{tag}:{x}:{y}", bytearray(W.dumps(W.box(x, y, x + 5, y + 5)))))
    return spark.createDataFrame(rows, "zone_id string, wkb binary")


def _points_df(spark, dx, dy):
    rows = []
    for x in range(0, 100, 10):
        for y in range(0, 100, 10):
            for tag in ("a", "b"):
                rows.append(
                    (f"{tag}:{x}:{y}", bytearray(W.dumps(W.point(x + dx, y + dy))))
                )
    return spark.createDataFrame(rows, "pt_id string, wkb binary")


def _squares_df(spark, dx, dy, side):
    rows = []
    for x in range(0, 100, 10):
        for y in range(0, 100, 10):
            for tag in ("a", "b"):
                rows.append(
                    (
                        f"{tag}:{x}:{y}",
                        bytearray(W.dumps(W.box(x + dx, y + dy, x + dx + side, y + dy + side))),
                    )
                )
    return spark.createDataFrame(rows, "obj_id string, wkb binary")


# -- the 200-pair contracts ---------------------------------------------------

def test_inside_points_contains_200(spark):
    # SpatialJoinQuery returns window-grouped results: 200 groups, 400 flat
    # pairs (JoinQuery.java:148-310; verify_join_result==200 in the reference)
    got = spatial_join(_zones_df(spark), _points_df(spark, 2.5, 2.5), "contains", grid=GRID)
    assert got.count() == 400
    assert got.groupBy("zone_id").count().count() == 200


def test_boundary_points_intersects_200(spark):
    # corner point (x+5, y+5) touches the zone boundary: intersects yes, contains no
    pts = _points_df(spark, 5.0, 5.0)
    got = spatial_join(_zones_df(spark), pts, "intersects", grid=GRID)
    assert got.groupBy("zone_id").count().count() == 200
    assert spatial_join(_zones_df(spark), pts, "contains", grid=GRID).count() == 0


def test_outside_points_0(spark):
    assert spatial_join(_zones_df(spark), _points_df(spark, 6.0, 6.0), "intersects", grid=GRID).count() == 0


def test_inside_polygons_contains_200(spark):
    objs = _squares_df(spark, 2.0, 2.0, 2.0)
    got = spatial_join(_zones_df(spark), objs, "contains", grid=GRID)
    assert got.count() == 400
    assert got.groupBy("zone_id").count().count() == 200


def test_overlap_polygons_intersects_200_covers_0(spark):
    objs = _squares_df(spark, 3.0, 3.0, 3.0)  # (x+3..x+6) overlaps (x..x+5)
    got = spatial_join(_zones_df(spark), objs, "intersects", grid=GRID)
    assert got.groupBy("zone_id").count().count() == 200
    assert spatial_join(_zones_df(spark), objs, "covers", grid=GRID).count() == 0


def test_inside_linestrings_200(spark):
    rows = []
    for x in range(0, 100, 10):
        for y in range(0, 100, 10):
            for tag in ("a", "b"):
                ls = W.linestring([(x + 1, y + 1), (x + 1, y + 4), (x + 4, y + 4)])
                rows.append((f"{tag}:{x}:{y}", bytearray(W.dumps(ls))))
    lines = spark.createDataFrame(rows, "obj_id string, wkb binary")
    got = spatial_join(_zones_df(spark), lines, "contains", grid=GRID)
    assert got.groupBy("zone_id").count().count() == 200


def test_distance_join_contract(spark):
    # centers of zones vs points 0.05 away: within 0.1 -> 200, within 0.01 -> 0
    centers = _points_df(spark, 2.5, 2.5)
    near = _points_df(spark, 2.5, 2.55)
    got = distance_join(centers, near, 0.1, grid=GRID)
    assert got.count() == 400  # 2 centers x 2 near points per cell
    assert got.groupBy("pt_id").count().count() == 200
    assert distance_join(centers, near, 0.01, grid=GRID).count() == 0


# -- dedup stress -------------------------------------------------------------

def test_dedup_8_pairs(spark):
    polys = [
        W.polygon([(3, 0), (3, 3), (0, 3), (0, 0)]),
        W.polygon([(4, 0), (4, 3), (1, 3), (1, 0)]),
        W.polygon([(3, 1), (3, 4), (0, 4), (0, 1)]),
        W.polygon([(4, 1), (4, 4), (1, 4), (1, 1)]),
    ]
    left = spark.createDataFrame(
        [(i, bytearray(W.dumps(p))) for i, p in enumerate(polys)], "lid int, wkb binary"
    )
    window = spark.createDataFrame(
        [(0, bytearray(W.dumps(W.box(0, 0, 4, 4)))), (1, bytearray(W.dumps(W.box(0, 0, 4, 4))))],
        "rid int, wkb binary",
    )
    # fine grid -> every polygon spans many cells; dedup must still give 4*2=8
    fine = Grid(0.0, 0.0, 4.01, 4.01, 3)
    got = spatial_join(left, window, "intersects", grid=fine)
    assert got.count() == 8


# -- brute-force oracle equivalence --------------------------------------------

def _random_geoms(rng, n, kinds=("point", "poly", "holed")):
    rows = []
    for i in range(n):
        kind = kinds[i % len(kinds)]
        cx, cy = rng.uniform(-10, 10, 2)
        if kind == "point":
            g = W.point(cx, cy)
        elif kind == "holed":
            # polygon with an interior ring: exercises every predicate's
            # hole handling through the full join plan (round-1 finding)
            r = rng.uniform(0.8, 1.8)
            shell = [(cx - r, cy - r), (cx + r, cy - r), (cx + r, cy + r), (cx - r, cy + r)]
            h = r * rng.uniform(0.25, 0.45)
            hole = [(cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h), (cx - h, cy + h)]
            g = W.polygon(shell, holes=[hole])
        else:
            r = rng.uniform(0.3, 1.5)
            angles = np.sort(rng.uniform(0, 2 * np.pi, rng.integers(4, 7)))
            pts = [(cx + r * np.cos(a), cy + r * np.sin(a)) for a in angles]
            g = W.polygon(pts)
        rows.append((i, kind, W.dumps(g)))
    return rows


@pytest.mark.parametrize("predicate", ["intersects", "contains", "within", "covers", "overlaps", "touches", "equals"])
def test_oracle_equivalence(spark, predicate):
    rng = np.random.default_rng(42)
    lrows = _random_geoms(rng, 60)
    rrows = _random_geoms(rng, 60)
    expected = set()
    for li, _, lw in lrows:
        lg = W.loads(lw)
        for ri, _, rw in rrows:
            if K.predicate_pair(predicate, lg, W.loads(rw)):
                expected.add((li, ri))
    left = spark.createDataFrame(
        [(i, bytearray(b)) for i, _, b in lrows], "lid int, wkb binary"
    )
    right = spark.createDataFrame(
        [(i, bytearray(b)) for i, _, b in rrows], "rid int, wkb binary"
    )
    grid = Grid(-12.0, -12.0, 12.01, 12.01, 4)
    got = {
        (r.lid, r.rid)
        for r in spatial_join(left, right, predicate, grid=grid).select("lid", "rid").collect()
    }
    assert got == expected


def test_oracle_distance_join(spark):
    rng = np.random.default_rng(7)
    lx, ly = rng.uniform(-10, 10, 80), rng.uniform(-10, 10, 80)
    rx, ry = rng.uniform(-10, 10, 80), rng.uniform(-10, 10, 80)
    r = 1.5
    d = np.hypot(lx[:, None] - rx[None, :], ly[:, None] - ry[None, :])
    expected = set(zip(*np.nonzero(d <= r)))
    left = spark.createDataFrame(
        [(int(i), bytearray(b)) for i, b in enumerate(W.points_to_wkb(lx, ly))],
        "lid int, wkb binary",
    )
    right = spark.createDataFrame(
        [(int(i), bytearray(b)) for i, b in enumerate(W.points_to_wkb(rx, ry))],
        "rid int, wkb binary",
    )
    grid = Grid(-12.0, -12.0, 12.01, 12.01, 4)
    got = {
        (r_.lid, r_.rid)
        for r_ in distance_join(left, right, r, grid=grid).select("lid", "rid").collect()
    }
    assert got == expected


def test_circle_mode_clamps_radius(spark):
    # CircleRDD clamp (Circle.java:76-81): a 4x4 polygon with tiny given radius
    # still matches points within its bbox half-diagonal (2*sqrt(2)) of center.
    left = spark.createDataFrame(
        [(0, bytearray(W.dumps(W.box(0, 0, 4, 4))))], "lid int, wkb binary"
    )
    right = spark.createDataFrame(
        [(0, bytearray(W.dumps(W.point(4.5, 2.0))))], "rid int, wkb binary"
    )
    grid = Grid(-1.0, -1.0, 6.01, 6.01, 3)
    # distance from center (2,2) = 2.5 < clamp 2*sqrt(2)=2.828 -> match
    assert distance_join(left, right, 0.1, grid=grid, mode="circle").count() == 1
    # true-distance mode: point is 0.5 from polygon, radius 0.1 -> no match
    assert distance_join(left, right, 0.1, grid=grid, mode="distance").count() == 0


# -- join types / broadcast -----------------------------------------------------

def test_semi_anti_outer(spark):
    zones = _zones_df(spark)
    pts = _points_df(spark, 2.5, 2.5).limit(100)
    semi = spatial_join(zones, pts, "contains", grid=GRID, how="left_semi")

    anti = spatial_join(zones, pts, "contains", grid=GRID, how="left_anti")
    assert semi.count() + anti.count() == 200
    outer = spatial_join(zones, pts, "contains", grid=GRID, how="left_outer")
    assert outer.count() == anti.count() + spatial_join(zones, pts, "contains", grid=GRID).count()


def test_broadcast_matches_partitioned(spark):
    zones = _zones_df(spark)
    pts = _points_df(spark, 2.5, 2.5)
    a = spatial_join(zones, pts, "contains", grid=GRID).count()
    b = spatial_join(zones, pts, "contains", grid=GRID, broadcast="left").count()
    assert a == b == 400


def test_range_query(spark):
    pts = _points_df(spark, 2.5, 2.5)
    win = W.dumps(W.box(0, 0, 30, 30))
    got = range_query(pts, win, "within", invert_args=False)
    # points at (x+2.5, y+2.5) for x,y in {0,10,20} -> 9 cells x 2 tags
    assert got.count() == 18


def test_auto_grid_inference(spark):
    zones = _zones_df(spark)
    pts = _points_df(spark, 2.5, 2.5)
    assert spatial_join(zones, pts, "contains").count() == 400


def test_geography_distance_join(spark):
    # two points ~111 km apart (1 deg latitude); radius in METERS
    a = spark.createDataFrame(
        [(0, bytearray(W.dumps(W.point(10.0, 50.0))))], "lid int, wkb binary"
    )
    b = spark.createDataFrame(
        [(0, bytearray(W.dumps(W.point(10.0, 51.0))))], "rid int, wkb binary"
    )
    grid = Grid(0.0, 40.0, 20.01, 60.01, 3)
    assert distance_join(a, b, 120_000.0, grid=grid, geography=True).count() == 1
    assert distance_join(a, b, 100_000.0, grid=grid, geography=True).count() == 0


def test_distance_join_column_radius(spark):
    left = spark.createDataFrame(
        [
            (0, bytearray(W.dumps(W.point(0.0, 0.0))), 5.0),
            (1, bytearray(W.dumps(W.point(50.0, 50.0))), 0.5),
        ],
        "lid int, wkb binary, r double",
    )
    right = spark.createDataFrame(
        [
            (0, bytearray(W.dumps(W.point(3.0, 4.0)))),   # dist 5 from lid 0
            (1, bytearray(W.dumps(W.point(50.0, 51.0)))),  # dist 1 from lid 1
        ],
        "rid int, wkb binary",
    )
    got = {(r.lid, r.rid) for r in distance_join(left, right, "r", grid=GRID).collect()}
    assert got == {(0, 0)}  # 5 <= 5 matches; 1 > 0.5 does not


def test_rectangle_fast_path_matches_kernel_refine(spark):
    """The native rectangle refine must agree with the pandas-UDF kernel
    refine on every predicate for a point set stressing corners, edges,
    eps-offsets and interiors."""
    import itertools

    from incubator_sedona_spark.functions.st import st_polygon_from_envelope
    from incubator_sedona_spark.operators.joins import spatial_join

    eps = 1e-9
    base = [0.0, 2.5, 5.0]
    offs = [0.0, eps / 2, -eps / 2, 3 * eps, -3 * eps, 0.1, -0.1]
    pts = [
        (i, x + dx, y + dy)
        for i, ((x, y), dx, dy) in enumerate(
            itertools.product(itertools.product(base, base), offs, offs)
        )
    ]
    pdf = spark.createDataFrame(pts, "pid long, x double, y double")
    zones = spark.createDataFrame([(0,)], "zid long").select(
        "zid",
        st_polygon_from_envelope(
            F.lit(0.0), F.lit(0.0), F.lit(5.0), F.lit(5.0)
        ).alias("wkb"),
    )
    grid = Grid(-1.0, -1.0, 7.0, 7.0, 2)
    for pred in ("contains", "covers", "intersects", "touches"):
        fast = {
            r.pid
            for r in spatial_join(
                zones, pdf, pred, grid=grid, right_point_cols=("x", "y"),
                left_rect=True,
            ).collect()
        }
        slow = {
            r.pid
            for r in spatial_join(
                zones, pdf, pred, grid=grid, right_point_cols=("x", "y"),
                left_rect=False,
            ).collect()
        }
        assert fast == slow, (pred, fast ^ slow)
    # with stored bbox columns (the GeoParquet-style layout) the whole join
    # plan is Python-free; auto-detection picks the fast path
    zones_bb = zones.select(
        "zid", "wkb",
        F.lit(0.0).alias("xmin"), F.lit(0.0).alias("ymin"),
        F.lit(5.0).alias("xmax"), F.lit(5.0).alias("ymax"),
    )
    j = spatial_join(zones_bb, pdf, "contains", grid=grid, right_point_cols=("x", "y"))
    # project away the wkb payload: with stored bboxes + the rect refine the
    # geometry bytes are never touched, so pruning yields a Python-free plan
    plan = j.select("zid", "pid")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
