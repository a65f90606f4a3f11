"""ST_SubDivide/Split, bounding circle, Hausdorff/Frechet, GeoJSON/GML/KML."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.functions import formats as FMT
from incubator_sedona_spark.functions import measures as M
from incubator_sedona_spark.functions import subdivide as SD
from incubator_sedona_spark.geom import wkb as W


def _area(g):
    a = 0.0
    for leaf in g.leaves():
        if leaf.kind == W.POLYGON:
            sh = leaf.parts[0]
            a += abs(np.sum(sh[:-1, 0] * sh[1:, 1] - sh[1:, 0] * sh[:-1, 1]) / 2)
            for h in leaf.parts[1:]:
                a -= abs(np.sum(h[:-1, 0] * h[1:, 1] - h[1:, 0] * h[:-1, 1]) / 2)
    return a


def test_subdivide_preserves_area_and_bounds_vertices():
    ang = np.linspace(0, 2 * np.pi, 41)
    poly = W.Geometry(W.POLYGON, [np.column_stack([50 + 30 * np.cos(ang), 50 + 30 * np.sin(ang)])])
    pieces = SD.subdivide_geometry(poly, 12)
    assert len(pieces) > 1
    assert sum(_area(p) for p in pieces) == pytest.approx(_area(poly), rel=1e-9)
    for p in pieces:
        assert len(p.vertices()) <= 12


def test_subdivide_explode_column(spark):
    from incubator_sedona_spark.functions.st import st_area

    # L-shape: 7 ring points > maxVertices=5, so it must split; the halves
    # are rectangles (5 points) that stop recursing
    l_ring = np.array(
        [(0, 0), (40, 0), (40, 20), (20, 20), (20, 40), (0, 40), (0, 0)], dtype=float
    )
    df = spark.createDataFrame(
        [(0, bytearray(W.dumps(W.Geometry(W.POLYGON, [l_ring]))))], "gid int, wkb binary"
    )
    out = SD.st_subdivide_explode(df, "wkb", 5)
    rows = out.select("gid", st_area(F.col("geom")).alias("a")).collect()
    assert len(rows) >= 2
    assert sum(r.a for r in rows) == pytest.approx(40 * 20 + 20 * 20)


def test_split_by_line():
    sq = W.loads(W.dumps(W.box(0.0, 0.0, 10.0, 10.0)))
    pieces = SD.split_by_line(sq, (5.0, -1.0), (5.0, 11.0))
    assert len(pieces) == 2
    assert sorted(_area(p) for p in pieces) == pytest.approx([50.0, 50.0])
    # diagonal blade
    pieces = SD.split_by_line(sq, (0.0, 0.0), (10.0, 10.0))
    assert sorted(_area(p) for p in pieces) == pytest.approx([50.0, 50.0])


def test_min_bounding_circle():
    # circle of a rectangle = circumscribed circle (center, half-diagonal)
    g = W.loads(W.dumps(W.box(0.0, 0.0, 8.0, 6.0)))
    c, r = M.min_bounding_circle(g.vertices())
    assert c[0] == pytest.approx(4.0) and c[1] == pytest.approx(3.0)
    assert r == pytest.approx(5.0)
    # collinear points
    c, r = M.min_bounding_circle(np.array([[0.0, 0.0], [2.0, 0.0], [10.0, 0.0]]))
    assert c[0] == pytest.approx(5.0) and r == pytest.approx(5.0)


def test_hausdorff_and_frechet():
    a = W.Geometry(W.LINESTRING, np.array([(0.0, 0.0), (10.0, 0.0)]))
    b = W.Geometry(W.LINESTRING, np.array([(0.0, 3.0), (10.0, 3.0)]))
    assert M.hausdorff(a, b) == pytest.approx(3.0)
    assert M.frechet(a, b) == pytest.approx(3.0)
    # reversed direction: hausdorff unchanged, frechet sees the swap
    b_rev = W.Geometry(W.LINESTRING, np.array([(10.0, 3.0), (0.0, 3.0)]))
    assert M.hausdorff(a, b_rev) == pytest.approx(3.0)
    assert M.frechet(a, b_rev) == pytest.approx(np.hypot(10.0, 3.0))
    # vertex-discrete semantics (JTS DiscreteHausdorffDistance): the apex
    # measures to flat's ENDPOINTS without densification...
    v = W.Geometry(W.LINESTRING, np.array([(0.0, 0.0), (5.0, 5.0), (10.0, 0.0)]))
    flat = W.Geometry(W.LINESTRING, np.array([(0.0, 0.0), (10.0, 0.0)]))
    assert M.hausdorff(v, flat) == pytest.approx(np.hypot(5.0, 5.0))
    # ...and to the densified segment points with a fraction
    assert M.hausdorff(v, flat, densify_frac=0.05) == pytest.approx(5.0, abs=0.3)


def test_measure_columns(spark):
    a = W.Geometry(W.LINESTRING, np.array([(0.0, 0.0), (10.0, 0.0)]))
    b = W.Geometry(W.LINESTRING, np.array([(0.0, 4.0), (10.0, 4.0)]))
    df = spark.createDataFrame([(bytearray(W.dumps(a)), bytearray(W.dumps(b)))], "a binary, b binary")
    row = df.select(
        M.st_hausdorff_distance(F.col("a"), F.col("b")).alias("h"),
        M.st_frechet_distance(F.col("a"), F.col("b")).alias("f"),
        M.st_minimum_bounding_radius(F.col("a")).alias("mbr"),
    ).first()
    assert row.h == pytest.approx(4.0) and row.f == pytest.approx(4.0)
    assert row.mbr[2] == pytest.approx(5.0)


def test_geojson_roundtrip():
    donut = W.Geometry(
        W.POLYGON,
        [
            np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]),
            np.array([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]),
        ],
    )
    for g in [W.point(1.5, -2.0), donut, W.multi(W.MULTIPOINT, [W.point(0, 0), W.point(1, 1)])]:
        j = FMT.geometry_to_geojson(g)
        g2 = FMT.geojson_to_geometry(json.dumps(j))
        assert W.dumps(g2) == W.dumps(g)


def test_format_columns(spark):
    g = W.loads(W.dumps(W.box(0.0, 0.0, 2.0, 2.0)))
    df = spark.createDataFrame([(bytearray(W.dumps(g)),)], "wkb binary")
    row = df.select(
        FMT.st_as_geojson(F.col("wkb")).alias("gj"),
        FMT.st_as_gml(F.col("wkb")).alias("gml"),
        FMT.st_as_kml(F.col("wkb")).alias("kml"),
    ).first()
    assert json.loads(row.gj)["type"] == "Polygon"
    assert row.gml.startswith("<gml:Polygon>") and "outerBoundaryIs" in row.gml
    assert row.kml.startswith("<Polygon>") and "coordinates" in row.kml
    back = df.select(FMT.st_geom_from_geojson(FMT.st_as_geojson(F.col("wkb"))).alias("w")).first()
    assert bytes(back.w) == W.dumps(g)
