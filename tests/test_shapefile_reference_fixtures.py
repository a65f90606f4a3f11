"""Shapefile reader parity against the reference's OWN test fixtures.

The reference validates its ShapefileReader on real shapefiles under
``core/src/test/resources/shapefiles/`` (ShapefileReaderTest.java).  These
tests run this engine's reader over the same files and assert the same
contracts the reference test suite asserts — record counts, the exact DBF
field list, and the skip-with-warning behavior for unsupported (Z) types.
Skipped wholesale when the reference checkout isn't present.
"""

import os
import warnings

import numpy as np
import pytest

from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.sources import shapefile as SF
from incubator_sedona_spark.sources.shapefile import parse_dbf, parse_shp, read_shapefile

REF = "/root/reference/core/src/test/resources/shapefiles"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference shapefile fixtures not available"
)


def test_dbf_fixture_field_names_and_rows(spark):
    """ShapefileReaderTest.java:339 asserts exactly this field list; :266-293
    walk 3220 county records."""
    df = read_shapefile(spark, f"{REF}/dbf", all_strings=True)
    assert df.columns == [
        "STATEFP", "COUNTYFP", "COUNTYNS", "AFFGEOID", "GEOID",
        "NAME", "LSAD", "ALAND", "AWATER", "wkb",
    ]
    rows = df.collect()
    assert len(rows) == 3220
    assert all(r["wkb"] is not None for r in rows)
    # every geometry decodes to a polygonal WKB with a sane lon/lat envelope
    g = W.loads(rows[0]["wkb"])
    assert g.kind in (W.POLYGON, W.MULTIPOLYGON)


def test_dbf_fixture_typed_columns(spark):
    """ALAND/AWATER are DBF 'N' integer fields -> typed long columns."""
    df = read_shapefile(spark, f"{REF}/dbf")
    types = dict(df.dtypes)
    assert types["ALAND"] == "bigint" and types["AWATER"] == "bigint"
    total_land = df.agg({"ALAND": "sum"}).first()[0]
    assert total_land and total_land > 0


def test_point_fixture_zero_field_dbf(spark):
    """testReadToPointRDD_Point reads 100,000 points; the sibling .dbf has a
    header but ZERO attribute fields — the reader must not demand alignment
    columns that don't exist."""
    df = read_shapefile(spark, f"{REF}/point")
    assert df.columns == ["wkb"]
    assert df.count() == 100000


def test_polyline_fixture(spark):
    """testReadToLineStringRDD: 1,000 polyline records."""
    df = read_shapefile(spark, f"{REF}/polyline")
    rows = df.collect()
    assert len(rows) == 1000
    kinds = {W.loads(r["wkb"]).kind for r in rows[:50]}
    assert kinds <= {W.LINESTRING, W.MULTILINESTRING}


def test_unsupported_fixture_skip_mode_yields_zero_rows(spark):
    """testShapefileEndWithUnsupportedType: a PolygonZ file reads as 0 rows
    in the reference (skip with warning, CombineShapeReader.java:148-154)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        df = read_shapefile(spark, f"{REF}/unsupported", on_unsupported="skip")
        assert df.count() == 0


def test_unsupported_fixture_loud_by_default():
    """This engine's deliberate deviation: the same file FAILS LOUDLY unless
    skip mode is requested (silent record loss is unacceptable at scale)."""
    buf = open(f"{REF}/unsupported/UrbAdm3D_142166_Bu_Ground.shp", "rb").read()
    with pytest.raises(NotImplementedError, match="POLYGONZ"):
        parse_shp(buf, "unsupported")


def test_unsupported_skip_keeps_dbf_alignment():
    """Skipped records emit an index-aligned sentinel, so the 20 DBF records
    stay in lockstep with the 20 skipped shapes (the reference advances both
    readers when skipping)."""
    buf = open(f"{REF}/unsupported/UrbAdm3D_142166_Bu_Ground.shp", "rb").read()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        geoms = parse_shp(buf, "unsupported", on_unsupported="skip")
    assert len(geoms) == 20
    assert all(isinstance(g, SF._Skipped) for g in geoms)
    _, cols = parse_dbf(open(f"{REF}/unsupported/UrbAdm3D_142166_Bu_Ground.dbf", "rb").read())
    assert len(next(iter(cols.values()))) == 20


def test_multiple_shapefiles_directory(spark):
    """testReadMultipleShapeFilesByMultiPartitions: a directory of several
    .shp triples reads as one DataFrame, one file per task."""
    df = read_shapefile(spark, f"{REF}/multipleshapefiles")
    per_file = (
        read_shapefile(spark, f"{REF}/multipleshapefiles/map1.shp").count()
        + read_shapefile(spark, f"{REF}/multipleshapefiles/map2.shp").count()
    )
    assert df.count() == per_file > 0


def test_real_world_osm_pois(spark):
    """gis_osm_pois_free_1: a real OSM extract (12,873 POIs with utf-8-ish
    attribute text) — end-to-end through the DataFrame path, coordinates in
    lon/lat range."""
    df = read_shapefile(spark, f"{REF}/gis_osm_pois_free_1", all_strings=True)
    rows = df.collect()
    assert len(rows) == 12873
    assert "osm_id" in df.columns and "fclass" in df.columns
    pts = np.array([W.loads(r["wkb"]).parts[0] for r in rows[:200]])
    assert np.all(np.abs(pts[:, 0]) <= 180) and np.all(np.abs(pts[:, 1]) <= 90)
