"""ST_ scalar surface + overlay + aggregates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.functions import overlay as O
from incubator_sedona_spark.functions import st as S
from incubator_sedona_spark.geom import wkb as W


def _df1(spark, g):
    return spark.createDataFrame([(bytearray(W.dumps(g)),)], "wkb binary")


def test_constructors_and_accessors(spark):
    df = spark.createDataFrame([(3.0, 4.0)], "x double, y double")
    row = df.select(
        S.st_point(F.col("x"), F.col("y")).alias("pt"),
    ).select(
        S.st_x(F.col("pt")).alias("px"),
        S.st_y(F.col("pt")).alias("py"),
        S.st_as_text(F.col("pt")).alias("wkt"),
        S.st_geometry_type(F.col("pt")).alias("t"),
    ).collect()[0]
    assert (row.px, row.py) == (3.0, 4.0)
    assert row.wkt == "POINT (3 4)"
    assert row.t == "ST_Point"


def test_wkt_roundtrip(spark):
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",), ("POINT (1.5 -2.25)",)],
        "wkt string",
    )
    out = df.select(S.st_as_text(S.st_geom_from_wkt(F.col("wkt"))).alias("rt")).collect()
    assert out[0].rt.startswith("POLYGON")
    assert out[1].rt == "POINT (1.5 -2.25)"


def test_measures(spark):
    df = _df1(spark, W.polygon([(0, 0), (10, 0), (10, 10), (0, 10)], holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]]))
    row = df.select(
        S.st_area(F.col("wkb")).alias("a"),
        S.st_length(F.col("wkb")).alias("l"),
        S.st_npoints(F.col("wkb")).alias("n"),
    ).collect()[0]
    assert row.a == pytest.approx(100 - 4)
    assert row.l == pytest.approx(40 + 8)
    assert row.n == 10


def test_centroid_and_envelope(spark):
    df = _df1(spark, W.box(2, 2, 6, 10))
    row = df.select(
        S.st_centroid_xy(F.col("wkb")).alias("c"),
        S.st_envelope_bbox(F.col("wkb")).alias("e"),
    ).collect()[0]
    assert row.c == pytest.approx([4.0, 6.0])
    assert row.e == [2.0, 2.0, 6.0, 10.0]


def test_transforms(spark):
    df = _df1(spark, W.point(1, 2))
    row = df.select(
        S.st_as_text(S.st_translate(F.col("wkb"), 10, 20)).alias("t"),
        S.st_as_text(S.st_flip_coordinates(F.col("wkb"))).alias("f"),
    ).collect()[0]
    assert row.t == "POINT (11 22)"
    assert row.f == "POINT (2 1)"


def test_convex_hull_and_simplify(spark):
    pts = W.multi(W.MULTIPOINT, [W.point(0, 0), W.point(4, 0), W.point(4, 4), W.point(0, 4), W.point(2, 2)])
    df = _df1(spark, pts)
    hull = W.loads(bytes(df.select(S.st_convex_hull(F.col("wkb")).alias("h")).collect()[0].h))
    assert hull.kind == W.POLYGON and abs(hull.bounds[2] - 4) < 1e-9
    line = W.linestring([(0, 0), (1, 0.001), (2, 0), (3, 0.001), (4, 0)])
    df = _df1(spark, line)
    simp = W.loads(bytes(df.select(S.st_simplify(F.col("wkb"), 0.01).alias("s")).collect()[0].s))
    assert len(simp.parts) == 2  # collapses to endpoints


def test_distance_sphere(spark):
    df = spark.createDataFrame([(0.0, 0.0, 0.0, 1.0)], "lon1 double, lat1 double, lon2 double, lat2 double")
    d = df.select(S.st_distance_sphere(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d")).collect()[0].d
    assert d == pytest.approx(111195.0, rel=1e-3)  # 1 degree of latitude


def test_geohash(spark):
    df = spark.createDataFrame([(-5.6, 42.6)], "lon double, lat double")
    gh = df.select(S.st_geohash(F.col("lon"), F.col("lat"), 5).alias("g")).collect()[0].g
    assert gh == "ezs42"  # canonical geohash test vector


def test_cell_ids(spark):
    from incubator_sedona_spark.cells import Grid

    grid = Grid(0.0, 0.0, 100.01, 100.01, 4)
    df = _df1(spark, W.box(0, 0, 7, 7))
    cells = df.select(S.st_cell_ids(F.col("wkb"), grid).alias("c")).collect()[0].c
    assert len(cells) == 4  # 7/6.25 spans 2 cells per axis


def test_st_predicate_column(spark):
    df = spark.createDataFrame(
        [
            (bytearray(W.dumps(W.box(0, 0, 10, 10))), bytearray(W.dumps(W.point(5, 5)))),
            (bytearray(W.dumps(W.box(0, 0, 10, 10))), bytearray(W.dumps(W.point(15, 5)))),
        ],
        "a binary, b binary",
    )
    got = [r.c for r in df.select(S.st_predicate("contains", F.col("a"), F.col("b")).alias("c")).collect()]
    assert got == [True, False]


# -- overlay -----------------------------------------------------------------

def test_intersection_convex(spark):
    df = spark.createDataFrame(
        [(bytearray(W.dumps(W.box(0, 0, 10, 10))), bytearray(W.dumps(W.box(5, 5, 15, 15))))],
        "a binary, b binary",
    )
    got = W.loads(bytes(df.select(O.st_intersection(F.col("a"), F.col("b")).alias("i")).collect()[0].i))
    assert got.kind == W.POLYGON
    assert got.bounds == (5.0, 5.0, 10.0, 10.0)


def test_intersection_empty_and_point(spark):
    df = spark.createDataFrame(
        [
            (bytearray(W.dumps(W.box(0, 0, 1, 1))), bytearray(W.dumps(W.box(5, 5, 6, 6)))),
            (bytearray(W.dumps(W.point(0.5, 0.5))), bytearray(W.dumps(W.box(0, 0, 1, 1)))),
        ],
        "a binary, b binary",
    )
    rows = df.select(O.st_intersection(F.col("a"), F.col("b")).alias("i")).collect()
    assert len(list(W.loads(bytes(rows[0].i)).leaves())) == 0  # empty collection
    assert W.loads(bytes(rows[1].i)).kind == W.POINT


def test_envelope_aggr(spark):
    rng = np.random.default_rng(1)
    xs, ys = rng.uniform(10, 20, 50), rng.uniform(30, 40, 50)
    df = spark.createDataFrame(
        [(bytearray(b),) for b in W.points_to_wkb(xs, ys)], "wkb binary"
    )
    row = O.st_envelope_aggr(df).collect()[0]
    assert row.env_xmin == pytest.approx(xs.min())
    assert row.env_ymax == pytest.approx(ys.max())
    env = W.loads(bytes(row.env_wkb))
    assert env.kind == W.POLYGON


def test_collect_aggr(spark):
    df = spark.createDataFrame(
        [
            ("g1", bytearray(W.dumps(W.box(0, 0, 1, 1)))),
            ("g1", bytearray(W.dumps(W.box(2, 2, 3, 3)))),
            ("g2", bytearray(W.dumps(W.point(9, 9)))),
        ],
        "grp string, wkb binary",
    )
    rows = {r.grp: W.loads(bytes(r.collected_wkb)) for r in O.st_collect_aggr(df, group_by=["grp"]).collect()}
    assert rows["g1"].kind == W.MULTIPOLYGON and len(rows["g1"].parts) == 2
    assert rows["g2"].kind == W.MULTIPOINT


def test_transform_mercator_roundtrip(spark):
    df = _df1(spark, W.point(-73.98, 40.75))
    merc = df.select(S.st_transform_4326_to_3857(F.col("wkb")).alias("m"))
    row = merc.select(
        S.st_x(F.col("m")).alias("mx"),
        S.st_y(F.col("m")).alias("my"),
        S.st_as_text(S.st_transform_3857_to_4326(F.col("m"))).alias("back"),
    ).collect()[0]
    assert row.mx == pytest.approx(-8235343.0, rel=1e-4)  # canonical NYC value
    assert row.my == pytest.approx(4975316.0, rel=1e-3)
    back = W.loads(bytes(_df1(spark, W.point(0, 0)).select(
        S.st_transform_3857_to_4326(S.st_transform_4326_to_3857(F.col("wkb"))).alias("b")
    ).collect()[0].b))
    assert np.allclose(back.vertices(), [[0, 0]], atol=1e-9)


def test_azimuth_num_geoms_dump(spark):
    df = spark.createDataFrame([(0.0, 0.0, 1.0, 1.0)], "x1 double, y1 double, x2 double, y2 double")
    az = df.select(S.st_azimuth(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")).alias("a")).collect()[0].a
    assert az == pytest.approx(np.pi / 4)
    mp = _df1(spark, W.multi(W.MULTIPOLYGON, [W.box(0, 0, 1, 1), W.box(2, 2, 3, 3)]))
    assert mp.select(S.st_num_geometries(F.col("wkb")).alias("n")).collect()[0].n == 2
    dumped = mp.select(F.explode(S.st_dump(F.col("wkb"))).alias("g"))
    assert dumped.count() == 2


def test_geometric_median(spark):
    pts = W.multi(W.MULTIPOINT, [W.point(0, 0), W.point(0, 0), W.point(0, 0), W.point(10, 0)])
    df = _df1(spark, pts)
    m = df.select(S.st_geometric_median(F.col("wkb")).alias("m")).collect()[0].m
    assert m[0] == pytest.approx(0.0, abs=1e-3) and m[1] == pytest.approx(0.0, abs=1e-3)


def test_boundary_and_exterior_ring(spark):
    df = _df1(spark, W.box(0, 0, 4, 4))
    b = W.loads(bytes(df.select(S.st_boundary_bbox(F.col("wkb")).alias("b")).collect()[0].b))
    assert b.kind == W.LINESTRING and len(b.parts) == 5
    e = W.loads(bytes(df.select(S.st_exterior_ring(F.col("wkb")).alias("e")).collect()[0].e))
    assert e.kind == W.LINESTRING


def test_intersection_aggr_convex(spark):
    df = spark.createDataFrame(
        [
            ("g", bytearray(W.dumps(W.box(0, 0, 10, 10)))),
            ("g", bytearray(W.dumps(W.box(5, 5, 15, 15)))),
            ("g", bytearray(W.dumps(W.box(0, 6, 20, 20)))),
        ],
        "grp string, wkb binary",
    )
    row = O.st_intersection_aggr(df, group_by=["grp"]).collect()[0]
    got = W.loads(bytes(row.intersection_wkb))
    assert got.bounds == (5.0, 6.0, 10.0, 10.0)


def test_st_boundary_full_semantics(spark):
    """JTS getBoundary parity: holed polygon -> MultiLineString(shell, hole);
    closed line -> EMPTY; MultiLineString -> mod-2 endpoints."""
    import numpy as np

    from incubator_sedona_spark.functions.st import st_boundary
    from incubator_sedona_spark.geom import wkb as W

    holed = W.Geometry(
        W.POLYGON,
        [
            np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], dtype=float),
            np.array([(3, 3), (6, 3), (6, 6), (3, 6), (3, 3)], dtype=float),
        ],
    )
    closed_line = W.linestring([(0, 0), (1, 0), (1, 1), (0, 0)])
    open_line = W.linestring([(0, 0), (5, 5)])
    mls = W.multi(
        W.MULTILINESTRING,
        [W.linestring([(0, 0), (1, 1)]), W.linestring([(1, 1), (2, 2)])],
    )
    df = spark.createDataFrame(
        [(bytearray(W.dumps(g)),) for g in (holed, closed_line, open_line, mls)],
        "wkb binary",
    )
    got = [W.loads(r.b) for r in df.select(st_boundary(F.col("wkb")).alias("b")).collect()]
    assert got[0].kind == W.MULTILINESTRING and len(got[0].parts) == 2
    assert got[1].kind == W.GEOMETRYCOLLECTION and len(got[1].parts) == 0
    assert got[2].kind == W.MULTIPOINT and len(got[2].parts) == 2
    # shared endpoint (1,1) appears twice -> excluded; (0,0) and (2,2) remain
    assert got[3].kind == W.MULTIPOINT and len(got[3].parts) == 2
    pts = sorted((float(p.parts[0][0]), float(p.parts[0][1])) for p in got[3].parts)
    assert pts == [(0.0, 0.0), (2.0, 2.0)]


def test_st_centroid_and_envelope_geometries(spark):
    from incubator_sedona_spark.functions.st import st_centroid, st_envelope
    from incubator_sedona_spark.geom import wkb as W

    sq = W.polygon([(0, 0), (4, 0), (4, 2), (0, 2), (0, 0)])
    df = spark.createDataFrame([(bytearray(W.dumps(sq)),)], "wkb binary")
    row = df.select(
        st_centroid(F.col("wkb")).alias("c"), st_envelope(F.col("wkb")).alias("e")
    ).first()
    c = W.loads(row.c)
    assert c.kind == W.POINT and tuple(c.parts[0][:2]) == (2.0, 1.0)
    e = W.loads(row.e)
    assert e.kind == W.POLYGON and e.bounds == (0.0, 0.0, 4.0, 2.0)
