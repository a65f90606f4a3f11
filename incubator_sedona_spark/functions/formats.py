"""Geometry text formats: GeoJSON in/out, GML and KML out.

Reference surface: ST_AsGeoJSON / ST_AsGML / ST_AsKML / ST_GeomFromGeoJSON
(Catalog.scala:86-91,130; impls common/.../Functions.java via JTS io).  The
engine reads/writes the standard formats directly from its WKB geometry
model; output strings follow the same shapes JTS writers emit (coordinate
order lon,lat; GML2 posLists; KML coordinate triplets without z).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import BinaryType, StringType

from incubator_sedona_spark.geom import wkb as W

_KIND_NAME = {
    W.POINT: "Point",
    W.LINESTRING: "LineString",
    W.POLYGON: "Polygon",
    W.MULTIPOINT: "MultiPoint",
    W.MULTILINESTRING: "MultiLineString",
    W.MULTIPOLYGON: "MultiPolygon",
    W.GEOMETRYCOLLECTION: "GeometryCollection",
}
_NAME_KIND = {v: k for k, v in _KIND_NAME.items()}


def _coords(arr: np.ndarray):
    return [[float(x), float(y)] for x, y in arr]


def geometry_to_geojson(g: W.Geometry) -> dict:
    if g.kind == W.POINT:
        return {"type": "Point", "coordinates": [float(g.parts[0, 0]), float(g.parts[0, 1])]}
    if g.kind == W.LINESTRING:
        return {"type": "LineString", "coordinates": _coords(g.parts)}
    if g.kind == W.POLYGON:
        return {"type": "Polygon", "coordinates": [_coords(r) for r in g.parts]}
    if g.kind in (W.MULTIPOINT, W.MULTILINESTRING, W.MULTIPOLYGON):
        children = [geometry_to_geojson(c)["coordinates"] for c in g.parts]
        return {"type": _KIND_NAME[g.kind], "coordinates": children}
    return {
        "type": "GeometryCollection",
        "geometries": [geometry_to_geojson(c) for c in g.parts],
    }


def geojson_to_geometry(obj) -> W.Geometry:
    if isinstance(obj, str):
        obj = json.loads(obj)
    if obj.get("type") == "Feature":
        obj = obj["geometry"]
    t = obj["type"]
    if t == "Point":
        x, y = obj["coordinates"][:2]
        return W.point(float(x), float(y))
    if t == "LineString":
        return W.Geometry(W.LINESTRING, np.asarray(obj["coordinates"], dtype=np.float64)[:, :2])
    if t == "Polygon":
        return W.Geometry(
            W.POLYGON,
            [np.asarray(r, dtype=np.float64)[:, :2] for r in obj["coordinates"]],
        )
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        sub = {"MultiPoint": "Point", "MultiLineString": "LineString", "MultiPolygon": "Polygon"}[t]
        return W.multi(
            _NAME_KIND[t],
            [geojson_to_geometry({"type": sub, "coordinates": c}) for c in obj["coordinates"]],
        )
    if t == "GeometryCollection":
        return W.multi(W.GEOMETRYCOLLECTION, [geojson_to_geometry(g) for g in obj["geometries"]])
    raise ValueError(f"unsupported GeoJSON type {t!r}")


def _poslist(arr: np.ndarray) -> str:
    return " ".join(f"{x:g},{y:g}" for x, y in arr)


def geometry_to_gml(g: W.Geometry) -> str:
    if g.kind == W.POINT:
        return f"<gml:Point><gml:coordinates>{_poslist(g.parts)}</gml:coordinates></gml:Point>"
    if g.kind == W.LINESTRING:
        return f"<gml:LineString><gml:coordinates>{_poslist(g.parts)}</gml:coordinates></gml:LineString>"
    if g.kind == W.POLYGON:
        shell = (
            "<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>"
            + _poslist(g.parts[0])
            + "</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>"
        )
        holes = "".join(
            "<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>"
            + _poslist(r)
            + "</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>"
            for r in g.parts[1:]
        )
        return f"<gml:Polygon>{shell}{holes}</gml:Polygon>"
    return "".join(geometry_to_gml(c) for c in g.parts)


def _kml_coords(arr: np.ndarray) -> str:
    return " ".join(f"{x:g},{y:g}" for x, y in arr)


def geometry_to_kml(g: W.Geometry) -> str:
    if g.kind == W.POINT:
        return f"<Point><coordinates>{_kml_coords(g.parts)}</coordinates></Point>"
    if g.kind == W.LINESTRING:
        return f"<LineString><coordinates>{_kml_coords(g.parts)}</coordinates></LineString>"
    if g.kind == W.POLYGON:
        shell = (
            "<outerBoundaryIs><LinearRing><coordinates>"
            + _kml_coords(g.parts[0])
            + "</coordinates></LinearRing></outerBoundaryIs>"
        )
        holes = "".join(
            "<innerBoundaryIs><LinearRing><coordinates>"
            + _kml_coords(r)
            + "</coordinates></LinearRing></innerBoundaryIs>"
            for r in g.parts[1:]
        )
        return f"<Polygon>{shell}{holes}</Polygon>"
    if g.kind == W.MULTIPOLYGON or g.kind == W.GEOMETRYCOLLECTION or g.kind in (
        W.MULTIPOINT,
        W.MULTILINESTRING,
    ):
        return "<MultiGeometry>" + "".join(geometry_to_kml(c) for c in g.parts) + "</MultiGeometry>"
    raise ValueError(f"unsupported kind {g.kind}")


def _str_udf(fn):
    @F.pandas_udf(StringType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([fn(W.loads(b)) for b in s])

    return _f


def st_as_geojson(wkb_col: Column) -> Column:
    return _str_udf(lambda g: json.dumps(geometry_to_geojson(g), separators=(",", ":")))(wkb_col)


def st_as_gml(wkb_col: Column) -> Column:
    return _str_udf(geometry_to_gml)(wkb_col)


def st_as_kml(wkb_col: Column) -> Column:
    return _str_udf(geometry_to_kml)(wkb_col)


def st_geom_from_geojson(json_col: Column) -> Column:
    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([W.dumps(geojson_to_geometry(t)) for t in s])

    return _f(json_col)
