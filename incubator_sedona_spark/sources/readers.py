"""Geometry text-format readers (SURVEY.md §2.1).

The reference reads WKT/WKB/GeoJSON/CSV point files through per-format RDD
mappers (core/.../formatMapper/FormatMapper.java, WktReader.java:41,
GeoJsonReader.java:39-81).  Spark-native form: ``spark.read.csv/json`` (scan,
pushdown, schema inference all built-in) + one vectorized parse UDF to WKB.
Invalid-geometry policy mirrors the reference's ``allowInvalid/skipInvalid``
flags.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BinaryType

from incubator_sedona_spark.geom import wkb as W


def _wkt_to_wkb_udf(skip_invalid: bool):
    from incubator_sedona_spark.functions.st import _parse_wkt

    @F.pandas_udf(BinaryType())
    def _p(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            try:
                out.append(W.dumps(_parse_wkt(t)))
            except Exception:
                if skip_invalid:
                    out.append(None)
                else:
                    raise
        return pd.Series(out)

    return _p


def read_wkt_csv(
    spark: SparkSession,
    path: str,
    wkt_column: int = 0,
    sep: str = "\t",
    skip_invalid: bool = True,
) -> DataFrame:
    """TSV/CSV with a WKT column -> DataFrame with ``wkb`` + the other columns
    as strings (the reference's userData-carry contract, WktReader.java:41)."""
    df = spark.read.option("sep", sep).csv(path)
    cols = df.columns
    wkt_col = cols[wkt_column]
    out = df.withColumn("wkb", _wkt_to_wkb_udf(skip_invalid)(F.col(wkt_col)))
    if skip_invalid:
        out = out.where(F.col("wkb").isNotNull())
    return out.select([c for c in cols if c != wkt_col] + ["wkb"])


def _geojson_geom_to_geometry(g: dict) -> W.Geometry:
    t = g["type"]
    c = g["coordinates"]
    if t == "Point":
        return W.point(*c[:2])
    if t == "LineString":
        return W.linestring(c)
    if t == "Polygon":
        return W.polygon(c[0], c[1:])
    if t == "MultiPoint":
        return W.multi(W.MULTIPOINT, [W.point(*p[:2]) for p in c])
    if t == "MultiLineString":
        return W.multi(W.MULTILINESTRING, [W.linestring(l) for l in c])
    if t == "MultiPolygon":
        return W.multi(W.MULTIPOLYGON, [W.polygon(p[0], p[1:]) for p in c])
    if t == "GeometryCollection":
        return W.multi(
            W.GEOMETRYCOLLECTION, [_geojson_geom_to_geometry(x) for x in g["geometries"]]
        )
    raise ValueError(f"unsupported GeoJSON type {t}")


def read_geojson(
    spark: SparkSession, path: str, skip_invalid: bool = True
) -> DataFrame:
    """Line-delimited GeoJSON Features -> (wkb, properties json string).

    GeoJsonReader analog (GeoJsonReader.java:39-81); properties ride along as
    a JSON string column (userData contract).
    """
    raw = spark.read.text(path)

    @F.pandas_udf(BinaryType())
    def _geom(s: pd.Series) -> pd.Series:
        out = []
        for line in s:
            try:
                obj = json.loads(line)
                g = obj["geometry"] if obj.get("type") == "Feature" else obj
                out.append(W.dumps(_geojson_geom_to_geometry(g)))
            except Exception:
                if skip_invalid:
                    out.append(None)
                else:
                    raise
        return pd.Series(out)

    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _props(s: pd.Series) -> pd.Series:
        out = []
        for line in s:
            try:
                obj = json.loads(line)
                out.append(json.dumps(obj.get("properties", {})))
            except Exception:
                out.append(None)
        return pd.Series(out)

    out = raw.select(
        _geom(F.col("value")).alias("wkb"), _props(F.col("value")).alias("properties")
    )
    if skip_invalid:
        out = out.where(F.col("wkb").isNotNull())
    return out


def save_as_wkt(df: DataFrame, path: str, geom_col: str = "wkb") -> None:
    """saveAsWKT analog (SpatialRDD.java:437-560) — text output of WKT."""
    from incubator_sedona_spark.functions.st import st_as_text

    df.withColumn("wkt", st_as_text(F.col(geom_col))).drop(geom_col).write.mode(
        "overwrite"
    ).csv(path, sep="\t")


def save_as_geojson(df: DataFrame, path: str, geom_col: str = "wkb") -> None:
    """saveAsGeoJSON analog (SpatialRDD.java:437-560): newline-delimited
    GeoJSON Features; non-geometry columns become the properties object."""
    import json as _json

    from pyspark.sql.types import StringType

    from incubator_sedona_spark.functions.formats import geometry_to_geojson
    from incubator_sedona_spark.geom import wkb as W

    other = [c for c in df.columns if c != geom_col]

    @F.pandas_udf(StringType())
    def _feature(wkbs: pd.Series, props_json: pd.Series) -> pd.Series:
        out = []
        for b, pj in zip(wkbs, props_json):
            feat = {
                "type": "Feature",
                "geometry": geometry_to_geojson(W.loads(b)),
                "properties": _json.loads(pj),
            }
            out.append(_json.dumps(feat, separators=(",", ":")))
        return pd.Series(out)

    props = F.to_json(F.struct(*[F.col(c) for c in other])) if other else F.lit("{}")
    df.select(_feature(F.col(geom_col), props).alias("value")).write.mode(
        "overwrite"
    ).text(path)
