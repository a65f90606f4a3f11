"""Coordinate reference system transforms (ST_Transform).

The reference delegates ST_Transform to GeoTools' full EPSG database
(/root/reference/common/src/main/java/org/apache/sedona/common/Functions.java:184-189,
Catalog.scala:71).  pyproj is not available in this environment, so the engine
implements the projections that cover the overwhelming majority of real
usage, from their published closed forms (Snyder 1987; Karney 2011
Krueger-series Transverse Mercator, accurate to sub-millimeter within a zone):

- ``epsg:4326``      — WGS84 geographic lon/lat (the hub CRS)
- ``epsg:3857``      — Web/Spherical Mercator
- ``epsg:326NN``     — WGS84 / UTM zone NN north
- ``epsg:327NN``     — WGS84 / UTM zone NN south

Every transform routes through 4326 (src -> 4326 -> dst), all vectorized
numpy over coordinate arrays.  Unknown EPSG codes raise ValueError — loud, not
silently wrong.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import BinaryType

from incubator_sedona_spark.geom import wkb as W

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = np.sqrt(_F * (2.0 - _F))
_N = _F / (2.0 - _F)

# Krueger series coefficients (order n^4)
_n = _N
_A_BAR = _A / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64)
_ALPHA = (
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440,
    61 * _n**3 / 240 - 103 * _n**4 / 140,
    49561 * _n**4 / 161280,
)
_BETA = (
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440,
    17 * _n**3 / 480 - 37 * _n**4 / 840,
    4397 * _n**4 / 161280,
)
_DELTA = (
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45,
    7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45,
    56 * _n**3 / 15 - 136 * _n**4 / 35,
    4279 * _n**4 / 630,
)

_K0_UTM = 0.9996
_FE_UTM = 500000.0
_FN_SOUTH = 10000000.0
_R_MERC = 6378137.0  # spherical web mercator radius


def tm_forward(lon_deg, lat_deg, lon0_deg: float, k0: float, fe: float, fn: float):
    """Transverse Mercator forward (Krueger series), vectorized."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return fe + k0 * _A_BAR * eta, fn + k0 * _A_BAR * xi


def tm_inverse(x, y, lon0_deg: float, k0: float, fe: float, fn: float):
    """Transverse Mercator inverse (Krueger series), vectorized."""
    xi = (np.asarray(y, dtype=np.float64) - fn) / (k0 * _A_BAR)
    eta = (np.asarray(x, dtype=np.float64) - fe) / (k0 * _A_BAR)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0_deg + np.degrees(lam), np.degrees(phi)


def merc_forward(lon_deg, lat_deg):
    x = np.radians(np.asarray(lon_deg, dtype=np.float64)) * _R_MERC
    y = np.log(np.tan(np.pi / 4 + np.radians(np.asarray(lat_deg, dtype=np.float64)) / 2)) * _R_MERC
    return x, y


def merc_inverse(x, y):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / _R_MERC)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / _R_MERC)) - np.pi / 2)
    return lon, lat


def utm_zone_lon0(zone: int) -> float:
    return (zone - 1) * 6.0 - 180.0 + 3.0


def _parse(crs: str):
    c = crs.lower().replace(" ", "")
    if not c.startswith("epsg:"):
        raise ValueError(f"unsupported CRS {crs!r} (use epsg:NNNN)")
    code = int(c[5:])
    if code == 4326:
        return ("geo",)
    if code == 3857:
        return ("merc",)
    if 32601 <= code <= 32660:
        return ("utm", code - 32600, 0.0)
    if 32701 <= code <= 32760:
        return ("utm", code - 32700, _FN_SOUTH)
    raise ValueError(f"unsupported CRS {crs!r} (supported: 4326, 3857, UTM 326NN/327NN)")


def transform_xy(x, y, src: str, dst: str):
    """Transform coordinate arrays src -> dst (through 4326 as hub)."""
    s, d = _parse(src), _parse(dst)
    if s[0] == "geo":
        lon, lat = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    elif s[0] == "merc":
        lon, lat = merc_inverse(x, y)
    else:
        lon, lat = tm_inverse(x, y, utm_zone_lon0(s[1]), _K0_UTM, _FE_UTM, s[2])
    if d[0] == "geo":
        return lon, lat
    if d[0] == "merc":
        return merc_forward(lon, lat)
    return tm_forward(lon, lat, utm_zone_lon0(d[1]), _K0_UTM, _FE_UTM, d[2])


def _transform_geometry(g: W.Geometry, src: str, dst: str) -> W.Geometry:
    def conv(coords: np.ndarray) -> np.ndarray:
        nx, ny = transform_xy(coords[:, 0], coords[:, 1], src, dst)
        return np.column_stack([nx, ny])

    if g.kind in (W.POINT, W.LINESTRING):
        return W.Geometry(g.kind, conv(g.parts))
    if g.kind == W.POLYGON:
        return W.Geometry(W.POLYGON, [conv(r) for r in g.parts])
    return W.Geometry(g.kind, [_transform_geometry(c, src, dst) for c in g.parts])


def st_transform(wkb_col: Column, src: str, dst: str) -> Column:
    """ST_Transform(geom, src, dst) — WKB in, WKB out (Functions.java:184-189).

    One Arrow-batched pandas UDF; all coordinate math is vectorized numpy."""
    _parse(src), _parse(dst)  # validate eagerly on the driver

    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([W.dumps(_transform_geometry(W.loads(b), src, dst)) for b in s])

    return _f(wkb_col)
