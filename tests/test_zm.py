"""Z/M coordinate model: serde roundtrips, accessors, editor carry-through.

Mirrors the reference serde's XY/XYZ/XYM/XYZM coverage
(GeometrySerializer.java:87-101) and the ST_Z/ST_ZMin/ST_ZMax/ST_NDims/
ST_Force3D surface (Catalog.scala:58-161).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.functions import zm
from incubator_sedona_spark.functions.editors import force_2d_geometry
from incubator_sedona_spark.functions.st import st_translate
from incubator_sedona_spark.geom import wkb as W


def _pt_xyz(x, y, z):
    return W.Geometry(W.POINT, np.array([[x, y, z]], dtype=np.float64), True, False)


def _ls_xyzm():
    return W.Geometry(
        W.LINESTRING,
        np.array([[0.0, 0.0, 1.0, 10.0], [2.0, 3.0, 4.0, 20.0]], dtype=np.float64),
        True,
        True,
    )


def test_wkb_roundtrip_xyz_point():
    g = _pt_xyz(1.0, 2.0, 3.0)
    back = W.loads(W.dumps(g))
    assert back.has_z and not back.has_m and back.ndims == 3
    assert np.array_equal(back.parts, g.parts)


def test_iso_and_ewkb_z_point_parse_identically():
    # POINT Z (1 2 3): EWKB (PostGIS/shapely) uses flag 0x80000000,
    # ISO uses type 1001 — both must decode to the same geometry
    import struct

    coords = struct.pack("<ddd", 1.0, 2.0, 3.0)
    ewkb = b"\x01" + struct.pack("<I", 0x80000001) + coords
    iso = b"\x01" + struct.pack("<I", 1001) + coords
    for buf in (ewkb, iso):
        g = W.loads(buf)
        assert g.has_z and g.parts[0, 2] == 3.0
    # re-emit is ISO
    assert W.dumps(W.loads(ewkb)) == iso


def test_wkb_roundtrip_xym_and_xyzm():
    m_ls = W.Geometry(
        W.LINESTRING,
        np.array([[0.0, 1.0, 5.0], [2.0, 3.0, 6.0]], dtype=np.float64),
        False,
        True,
    )
    back = W.loads(W.dumps(m_ls))
    assert back.has_m and not back.has_z and back.ndims == 3
    assert np.array_equal(back.parts, m_ls.parts)

    zm_ls = _ls_xyzm()
    back = W.loads(W.dumps(zm_ls))
    assert back.has_z and back.has_m and back.ndims == 4
    assert np.array_equal(back.parts, zm_ls.parts)


def test_wkb_roundtrip_3d_polygon_and_multipolygon():
    ring = np.array(
        [[0, 0, 1], [4, 0, 2], [4, 4, 3], [0, 4, 4], [0, 0, 1]], dtype=np.float64
    )
    poly = W.Geometry(W.POLYGON, [ring], True, False)
    back = W.loads(W.dumps(poly))
    assert back.has_z and np.array_equal(back.parts[0], ring)
    # planar consumers see XY only
    assert back.bounds == (0.0, 0.0, 4.0, 4.0)
    assert back.vertices().shape[1] == 2

    mp = W.multi(W.MULTIPOLYGON, [poly, poly])
    back = W.loads(W.dumps(mp))
    assert back.has_z and all(c.has_z for c in back.parts)


def test_z_accessors(spark):
    rows = [
        (bytearray(W.dumps(_pt_xyz(1.0, 2.0, 7.5))),),
        (bytearray(W.dumps(W.point(3.0, 4.0))),),
    ]
    df = spark.createDataFrame(rows, "wkb binary")
    got = df.select(
        zm.st_z(F.col("wkb")).alias("z"),
        zm.st_ndims(F.col("wkb")).alias("nd"),
        zm.st_hasz(F.col("wkb")).alias("hz"),
        zm.st_zmin(F.col("wkb")).alias("zmin"),
        zm.st_zmax(F.col("wkb")).alias("zmax"),
    ).collect()
    assert got[0].z == 7.5 and got[0].nd == 3 and got[0].hz
    assert got[0].zmin == 7.5 and got[0].zmax == 7.5
    assert got[1].z is None and got[1].nd == 2 and not got[1].hz
    assert got[1].zmin is None


def test_zmin_zmax_over_linestring(spark):
    df = spark.createDataFrame([(bytearray(W.dumps(_ls_xyzm())),)], "wkb binary")
    got = df.select(
        zm.st_zmin(F.col("wkb")).alias("lo"), zm.st_zmax(F.col("wkb")).alias("hi")
    ).collect()[0]
    assert got.lo == 1.0 and got.hi == 4.0


def test_force_3d_and_force_2d(spark):
    df = spark.createDataFrame([(bytearray(W.dumps(W.point(1.0, 2.0))),)], "wkb binary")
    up = df.select(zm.st_force_3d(F.col("wkb"), 9.0).alias("w3"))
    g3 = W.loads(up.collect()[0].w3)
    assert g3.has_z and g3.parts[0, 2] == 9.0
    from incubator_sedona_spark.functions.editors import st_force_2d

    down = up.select(st_force_2d(F.col("w3")).alias("w2"))
    g2 = W.loads(down.collect()[0].w2)
    assert not g2.has_z and g2.parts.shape == (1, 2)


def test_editors_carry_z_through(spark):
    df = spark.createDataFrame(
        [(bytearray(W.dumps(_pt_xyz(1.0, 2.0, 3.25))),)], "wkb binary"
    )
    moved = df.select(st_translate(F.col("wkb"), 10.0, 20.0).alias("w")).collect()[0].w
    g = W.loads(moved)
    assert g.has_z
    assert tuple(g.parts[0]) == (11.0, 22.0, 3.25)


def test_3d_distance(spark):
    a = bytearray(W.dumps(_pt_xyz(0.0, 0.0, 0.0)))
    b = bytearray(W.dumps(_pt_xyz(1.0, 2.0, 2.0)))
    df = spark.createDataFrame([(a, b)], "wa binary, wb binary")
    got = df.select(zm.st_3ddistance(F.col("wa"), F.col("wb")).alias("d")).collect()
    assert got[0].d == pytest.approx(3.0)
    # 2-D point gets z=0
    c = bytearray(W.dumps(W.point(1.0, 2.0)))
    df2 = spark.createDataFrame([(a, c)], "wa binary, wb binary")
    got2 = df2.select(zm.st_3ddistance(F.col("wa"), F.col("wb")).alias("d")).collect()
    assert got2[0].d == pytest.approx(np.sqrt(5.0))


def test_predicates_ignore_z(spark):
    """A 3-D polygon still works in the planar kernel (XY projection)."""
    from incubator_sedona_spark.geom import kernel as K

    ring = np.array(
        [[0, 0, 1], [4, 0, 2], [4, 4, 3], [0, 4, 4], [0, 0, 1]], dtype=np.float64
    )
    poly = W.Geometry(W.POLYGON, [ring], True, False)
    pt_in = _pt_xyz(2.0, 2.0, 99.0)
    assert K.predicate_pair("contains", poly, pt_in)
    pt_out = _pt_xyz(9.0, 9.0, 0.0)
    assert not K.predicate_pair("contains", poly, pt_out)


# -- general 3D distance (round 3: beyond point-only) -------------------------


def _ls3(*pts):
    return W.Geometry(W.LINESTRING, np.array(pts, dtype=float), True, False)


def test_geom_3d_distance_kernel_goldens():
    sq = W.polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    cases = [
        (zm.point_z(0, 0, 0), zm.point_z(1, 2, 2), 3.0),
        (zm.point_z(0, 0, 5), _ls3((0, 0, 0), (10, 0, 0)), 5.0),          # pt-seg
        (_ls3((0, 0, 0), (1, 0, 0)), _ls3((0, 1, 1), (1, 1, 1)), 2**0.5),  # skew
        (zm.point_z(5, 5, 7), sq, 7.0),     # above interior -> perpendicular
        (zm.point_z(13, 5, 4), sq, 5.0),    # beyond edge -> 3-4-5
        (_ls3((5, 5, -1), (5, 5, 1)), sq, 0.0),   # pierces the facet
        (_ls3((20, 5, -1), (20, 5, 1)), sq, 10.0),  # pierces plane outside
    ]
    for ga, gb, want in cases:
        assert zm.geom_3d_distance(ga, gb) == pytest.approx(want, abs=1e-12)
        assert zm.geom_3d_distance(gb, ga) == pytest.approx(want, abs=1e-12)
    # hole: point over the hole measures to the hole edge, not the plane
    holed = W.Geometry(
        W.POLYGON,
        [
            np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], dtype=float),
            np.array([(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)], dtype=float),
        ],
    )
    assert zm.geom_3d_distance(zm.point_z(5, 5, 3), holed) == pytest.approx(10**0.5)
    # parallel coaxial squares -> plane gap
    sq2 = zm.force_3d_geometry(W.polygon([(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)]), 4.0)
    assert zm.geom_3d_distance(sq, sq2) == pytest.approx(4.0)


def test_st_3ddistance_column_general(spark):
    rows = [
        (
            bytearray(W.dumps(zm.point_z(5.0, 5.0, 7.0))),
            bytearray(W.dumps(W.polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]))),
        ),
        (
            bytearray(W.dumps(_ls3((0, 0, 0), (1, 0, 0)))),
            bytearray(W.dumps(_ls3((0, 1, 1), (1, 1, 1)))),
        ),
    ]
    df = spark.createDataFrame(rows, "a binary, b binary")
    got = [r.d for r in df.select(zm.st_3ddistance(F.col("a"), F.col("b")).alias("d")).collect()]
    assert got[0] == pytest.approx(7.0)
    assert got[1] == pytest.approx(2**0.5)
