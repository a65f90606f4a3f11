"""Regression tests for the round-1 judge/advisor findings (VERDICT.md, ADVICE.md).

Each test reproduces a reported bug and pins the fixed behavior:
- knn_join: clipped first ring treated as final (ADVICE high #1)
- geography distance join longitude expansion above 25 deg lat (ADVICE high #2)
- RS_Divide band order (ADVICE medium)
- EWKB SRID flag parsing (ADVICE low)
- holed-polygon centroid (ADVICE low / VERDICT wrong #2)
- covers/contains false positive with holes (VERDICT wrong #1)
- st_is_valid self-intersection (VERDICT wrong #6)
- broadcast join right_outer + existence (VERDICT missing #5)
"""

import numpy as np
import pytest

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.geom import kernel as K
from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.operators.joins import distance_join, spatial_join
from incubator_sedona_spark.operators.knn import knn_join


def test_knn_join_small_first_ring_not_final(spark):
    # ADVICE repro: 1 left point at (1,1), 6 right points near (60,60)/(99,99),
    # k=3, level-5 grid.  r0 is small, the clipped square misses every right
    # point; the fixed schedule must still return the 3 true neighbors.
    grid = Grid(0.0, 0.0, 100.01, 100.01, 5)
    left = spark.createDataFrame([(0, 1.0, 1.0)], "lid int, x double, y double")
    rpts = [(0, 60.0, 60.0), (1, 60.5, 60.0), (2, 60.0, 60.5),
            (3, 99.0, 99.0), (4, 99.5, 99.0), (5, 99.0, 99.5)]
    right = spark.createDataFrame(rpts, "rid int, x double, y double")
    got = knn_join(left, right, 3, grid, left_id="lid", tiebreak="rid").collect()
    assert len(got) == 3
    assert {r.rid for r in got} == {0, 1, 2}


def test_knn_join_randomized_bruteforce_sparse_right(spark):
    # sparse right side forces multi-round escalation through the cross round
    rng = np.random.default_rng(17)
    lx, ly = rng.uniform(0, 100, 25), rng.uniform(0, 100, 25)
    rx, ry = rng.uniform(80, 100, 8), rng.uniform(80, 100, 8)
    k = 3
    grid = Grid(0.0, 0.0, 100.01, 100.01, 5)
    left = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(lx, ly))],
        "lid int, x double, y double",
    )
    right = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(rx, ry))],
        "rid int, x double, y double",
    )
    got = knn_join(left, right, k, grid, left_id="lid", tiebreak="rid").collect()
    assert len(got) == 25 * k
    by_left = {}
    for r in got:
        by_left.setdefault(r.lid, set()).add(r.rid)
    d = np.hypot(lx[:, None] - rx[None, :], ly[:, None] - ry[None, :])
    for i in range(25):
        assert by_left[i] == set(np.argsort(d[i])[:k].tolist()), i


def test_geography_distance_join_high_latitude(spark):
    # ADVICE repro: at lat 60, radius 30 km, two points 0.5 deg apart in lon
    # are ~27.8 km apart but were dropped by the unscaled lon expansion.
    left = spark.createDataFrame([(0, 10.0, 60.0)], "lid int, x double, y double")
    right = spark.createDataFrame([(0, 10.5, 60.0)], "rid int, x double, y double")
    got = distance_join(
        left, right, 30000.0,
        left_point_cols=("x", "y"), right_point_cols=("x", "y"),
        geography=True, level=4,
    ).collect()
    assert len(got) == 1
    # and a pair beyond the radius stays excluded
    far = spark.createDataFrame([(1, 11.2, 60.0)], "rid int, x double, y double")
    got2 = distance_join(
        left, far, 30000.0,
        left_point_cols=("x", "y"), right_point_cols=("x", "y"),
        geography=True, level=4,
    ).collect()
    assert got2 == []


def test_rs_divide_band_order(spark):
    from pyspark.sql import functions as F

    from incubator_sedona_spark.operators.raster import rs_divide

    df = spark.createDataFrame(
        [([10.0, 9.0], [4.0, 3.0])], "b1 array<double>, b2 array<double>"
    )
    got = df.select(rs_divide(F.col("b1"), F.col("b2")).alias("d")).first().d
    assert got == [2.5, 3.0]  # band1/band2, rounded to 2 decimals


def test_ewkb_srid_flag_parses():
    import struct

    # hand-built EWKB point: little endian, type POINT | 0x20000000, srid 4326
    buf = struct.pack("<BIIdd", 1, 1 | 0x20000000, 4326, 3.5, -2.25)
    g = W.loads(buf)
    assert g.kind == W.POINT
    assert g.parts[0][0] == 3.5 and g.parts[0][1] == -2.25


def test_ewkb_zm_flags_parsed():
    """Round 2 rejected Z/M WKB loudly; round 3 parses and carries it (see
    tests/test_zm.py for the full surface).  The round-2 invariant that
    coordinates are never silently corrupted still holds — the third double
    must land in the Z/M column, not shift X/Y."""
    import struct

    for flag, attr in ((0x80000000, "has_z"), (0x40000000, "has_m")):
        buf = struct.pack("<BIddd", 1, 1 | flag, 1.0, 2.0, 3.0)
        g = W.loads(buf)
        assert getattr(g, attr) and tuple(g.parts[0, :2]) == (1.0, 2.0)
        assert g.parts[0, 2] == 3.0
    g = W.loads(struct.pack("<BIddd", 1, 1001, 1.0, 2.0, 3.0))
    assert g.has_z and tuple(g.parts[0]) == (1.0, 2.0, 3.0)


def _donut():
    shell = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    # hole offset to the right: pulls the true centroid LEFT of the shell mean
    hole = [(6.0, 4.0), (9.0, 4.0), (9.0, 7.0), (6.0, 7.0), (6.0, 4.0)]
    return W.Geometry(
        W.POLYGON,
        [np.array(shell, dtype=np.float64), np.array(hole, dtype=np.float64)],
    )


def test_centroid_with_hole(spark):
    from pyspark.sql import functions as F

    from incubator_sedona_spark.functions.st import st_centroid_xy

    df = spark.createDataFrame([(bytearray(W.dumps(_donut())),)], "wkb binary")
    cx, cy = df.select(st_centroid_xy(F.col("wkb")).alias("c")).first().c
    # exact: (100*5 - 9*7.5)/91, (100*5 - 9*5.5)/91
    assert cx == pytest.approx((500.0 - 9 * 7.5) / 91.0, abs=1e-9)
    assert cy == pytest.approx((500.0 - 9 * 5.5) / 91.0, abs=1e-9)


def test_covers_rejects_hole_inside_candidate():
    # A = square with a hole strictly inside B; every vertex of B is covered
    # and no edge properly crosses, but B's interior dips into the hole.
    shell = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
    hole = np.array([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)])
    a = W.Geometry(W.POLYGON, [shell, hole])
    b = W.loads(W.dumps(W.box(3.0, 3.0, 7.0, 7.0)))
    assert not K.predicate_pair("covers", a, b)
    assert not K.predicate_pair("contains", a, b)
    # but a candidate clear of the hole is still covered
    c = W.loads(W.dumps(W.box(0.5, 0.5, 3.0, 3.0)))
    assert K.predicate_pair("covers", a, c)
    assert K.predicate_pair("contains", a, c)
    # and the donut itself does not EQUAL the full square
    full = W.loads(W.dumps(W.box(0.0, 0.0, 10.0, 10.0)))
    assert not K.predicate_pair("equals", a, full)


def test_is_valid_detects_bowtie(spark):
    from pyspark.sql import functions as F

    from incubator_sedona_spark.functions.st import st_is_valid

    bow = W.Geometry(
        W.POLYGON,
        [np.array([(0.0, 0.0), (4.0, 4.0), (4.0, 0.0), (0.0, 4.0), (0.0, 0.0)])],
    )
    ok = W.loads(W.dumps(W.box(0.0, 0.0, 4.0, 4.0)))
    df = spark.createDataFrame(
        [(0, bytearray(W.dumps(bow))), (1, bytearray(W.dumps(ok)))], "i int, wkb binary"
    )
    got = {r.i: r.v for r in df.select("i", st_is_valid(F.col("wkb")).alias("v")).collect()}
    assert got == {0: False, 1: True}


def _zones_and_points(spark):
    zones = [
        (0, bytearray(W.dumps(W.box(0.0, 0.0, 10.0, 10.0)))),
        (1, bytearray(W.dumps(W.box(20.0, 20.0, 30.0, 30.0)))),
        (2, bytearray(W.dumps(W.box(50.0, 50.0, 60.0, 60.0)))),  # empty zone
    ]
    pts = [(100, 5.0, 5.0), (101, 25.0, 25.0), (102, 26.0, 26.0), (103, 90.0, 90.0)]
    zdf = spark.createDataFrame(zones, "zid int, wkb binary")
    pdf = spark.createDataFrame(pts, "pid int, x double, y double")
    return zdf, pdf


def test_spatial_join_right_outer(spark):
    zdf, pdf = _zones_and_points(spark)
    got = spatial_join(
        zdf, pdf, "contains", level=3, how="right_outer", right_point_cols=("x", "y")
    ).collect()
    by_pid = {}
    for r in got:
        by_pid.setdefault(r.pid, []).append(r.zid)
    assert by_pid[100] == [0]
    assert by_pid[101] == [1]
    assert by_pid[102] == [1]
    assert by_pid[103] == [None]  # unmatched right row survives with null left
    assert len(got) == 4


def test_spatial_join_existence(spark):
    zdf, pdf = _zones_and_points(spark)
    got = spatial_join(
        zdf, pdf, "contains", level=3, how="existence", right_point_cols=("x", "y")
    ).collect()
    by_zid = {r.zid: r["exists"] for r in got}
    assert by_zid == {0: True, 1: True, 2: False}
    assert len(got) == 3
