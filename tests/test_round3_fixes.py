"""Regression tests for the round-2 judge/advisor findings (VERDICT.md, ADVICE.md).

- GML/KML writers: full round-trip coordinate precision (ADVICE medium)
- GML Multi* output wrapped in gml:Multi*/member elements (ADVICE low)
- ST_GeomFromGML / ST_GeomFromKML input parsers (VERDICT missing #5)
- MultiPolygon centroid with mixed shell windings (ADVICE low)
- distance_join right_outer keeps emit_distance (ADVICE low)
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.functions import formats as FMT
from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.operators.joins import distance_join


def _sq(x0, y0, s=1.0, cw=False):
    ring = [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)]
    if cw:
        ring = ring[::-1]
    return np.array(ring, dtype=np.float64)


def test_gml_kml_full_precision():
    g = W.point(-122.419416, 37.774929)
    gml = FMT.geometry_to_gml(g)
    kml = FMT.geometry_to_kml(g)
    assert "-122.419416" in gml and "37.774929" in gml
    assert "-122.419416" in kml and "37.774929" in kml


def test_gml_multipolygon_wrapped():
    mp = W.multi(
        W.MULTIPOLYGON,
        [W.Geometry(W.POLYGON, [_sq(0, 0)]), W.Geometry(W.POLYGON, [_sq(5, 5)])],
    )
    gml = FMT.geometry_to_gml(mp)
    assert gml.startswith("<gml:MultiPolygon>") and gml.endswith("</gml:MultiPolygon>")
    assert gml.count("<gml:polygonMember>") == 2
    mpt = W.multi(W.MULTIPOINT, [W.point(1, 2), W.point(3, 4)])
    gmlp = FMT.geometry_to_gml(mpt)
    assert "<gml:MultiPoint>" in gmlp and gmlp.count("<gml:pointMember>") == 2


@pytest.mark.parametrize(
    "geom",
    [
        W.point(-122.419416, 37.774929),
        W.Geometry(W.LINESTRING, np.array([[0.0, 0.0], [1.5, 2.25], [3.0, 1.0]])),
        W.Geometry(W.POLYGON, [_sq(0, 0, 10), _sq(2, 2, 1, cw=True)]),
        W.multi(
            W.MULTIPOLYGON,
            [W.Geometry(W.POLYGON, [_sq(0, 0)]), W.Geometry(W.POLYGON, [_sq(5, 5)])],
        ),
        W.multi(W.MULTIPOINT, [W.point(1, 2), W.point(3, 4)]),
        W.multi(
            W.MULTILINESTRING,
            [
                W.Geometry(W.LINESTRING, np.array([[0.0, 0.0], [1.0, 1.0]])),
                W.Geometry(W.LINESTRING, np.array([[2.0, 2.0], [3.0, 3.0]])),
            ],
        ),
    ],
)
def test_gml_kml_roundtrip(geom):
    back_gml = FMT.xml_text_to_geometry(FMT.geometry_to_gml(geom))
    assert W.dumps(back_gml) == W.dumps(geom)
    back_kml = FMT.xml_text_to_geometry(FMT.geometry_to_kml(geom))
    # KML has no Multi* elements; homogeneous MultiGeometry decodes back to
    # the corresponding Multi kind, so the roundtrip is exact here too
    assert W.dumps(back_kml) == W.dumps(geom)


def test_gml3_poslist_parses():
    gml3 = (
        "<gml:LineString><gml:posList>0.0 0.0 1.0 1.0 2.0 0.5</gml:posList>"
        "</gml:LineString>"
    )
    g = FMT.xml_text_to_geometry(gml3)
    assert g.kind == W.LINESTRING and len(g.parts) == 3


def test_st_geom_from_gml_kml_columns(spark):
    rows = [
        ("<gml:Point><gml:coordinates>5.5,6.5</gml:coordinates></gml:Point>",),
        (
            "<gml:Polygon><gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>"
            "0,0 4,0 4,4 0,4 0,0"
            "</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>",
        ),
    ]
    df = spark.createDataFrame(rows, "gml string")
    out = df.select(FMT.st_geom_from_gml(F.col("gml")).alias("wkb")).collect()
    g0, g1 = W.loads(out[0].wkb), W.loads(out[1].wkb)
    assert g0.kind == W.POINT and tuple(g0.parts[0]) == (5.5, 6.5)
    assert g1.kind == W.POLYGON and len(g1.parts[0]) == 5

    kml = "<Point><coordinates>1.25,2.5</coordinates></Point>"
    out = (
        spark.createDataFrame([(kml,)], "kml string")
        .select(FMT.st_geom_from_kml(F.col("kml")).alias("wkb"))
        .collect()
    )
    assert tuple(W.loads(out[0].wkb).parts[0]) == (1.25, 2.5)


def test_multipolygon_centroid_mixed_windings(spark):
    """Two unit squares stored with OPPOSITE shell windings: their signed
    areas must not cancel — centroid is the midpoint of the two centers."""
    from incubator_sedona_spark.functions.st import st_centroid_xy

    mp = W.multi(
        W.MULTIPOLYGON,
        [
            W.Geometry(W.POLYGON, [_sq(0, 0)]),          # CCW
            W.Geometry(W.POLYGON, [_sq(10, 0, cw=True)]),  # CW
        ],
    )
    df = spark.createDataFrame([(bytearray(W.dumps(mp)),)], "wkb binary")
    c = df.select(st_centroid_xy(F.col("wkb")).alias("c")).collect()[0].c
    assert c[0] == pytest.approx(5.5) and c[1] == pytest.approx(0.5)


def test_distance_join_right_outer_keeps_emit_distance(spark):
    grid = Grid(0.0, 0.0, 100.01, 100.01, 3)
    left = spark.createDataFrame([(0, 10.0, 10.0)], "lid int, x double, y double")
    right = spark.createDataFrame(
        [(0, 11.0, 10.0), (1, 90.0, 90.0)], "rid int, x double, y double"
    )
    out = distance_join(
        left,
        right,
        5.0,
        grid=grid,
        left_point_cols=("x", "y"),
        right_point_cols=("x", "y"),
        how="right_outer",
        emit_distance="dist",
    )
    assert "dist" in out.columns
    rows = {r.rid: r for r in out.collect()}
    assert rows[0].dist == pytest.approx(1.0)
    assert rows[1].dist is None and rows[1].lid is None
