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
- ``epsg:2154``      — RGF93 / Lambert-93 (Lambert conformal conic 2SP)
- ``epsg:3347``      — NAD83 / Statistics Canada Lambert
- ``epsg:5070``      — NAD83 / CONUS Albers equal-area
- ``epsg:3310``      — NAD83 / California Albers
- ``epsg:3031/3413/3995`` — polar stereographic variant B (Antarctic / NSIDC
  Arctic / Arctic; k=1 on the standard parallel, validated numerically)
- ``epsg:5041/5042`` — UPS north/south (variant A, k0=0.994; matches the
  EPSG Guidance Note 7-2 worked example to 1 cm)
- ``epsg:27700``     — OSGB36 / British National Grid (TM on Airy 1830 +
  the published 7-parameter Helmert; ~2 m vs the OSTN15 grid — documented)
- ``epsg:2193``      — NZGD2000 / New Zealand Transverse Mercator
- ``epsg:258NN``     — ETRS89 / UTM zones 28-38 north
- ``epsg:269NN``     — NAD83 / UTM zones 1-23 north
- ``epsg:26985``     — NAD83 / Maryland state plane (LCC 2SP, meters)
- plus the bulk batches in crs_tables.py (~340 codes total): WGS72 UTM
  N+S (322NN/323NN), GDA94/GDA2020 MGA zones, French RGF93 CC42-50 and
  legacy NTF Lambert I-III (LCC 1SP + datum), ETRS89 LCC/LAEA Europe
  (3034/3035), SWEREF99 TM, TM35FIN, Poland CS92/CS2000, Irish TM,
  California state planes 1-6 — each batch validated by definition-point
  goldens in tests

LCC 2SP and Albers follow Snyder (1987) eqs 15-1..15-11 / 14-1..14-21 on the
per-CRS ellipsoid (GRS80 for the NAD83/RGF93 codes).  NAD83/RGF93 lon/lat is
treated as WGS84 at the hub (datum offset < 2 m, the standard null-transform
assumption).  Every transform routes through 4326 (src -> 4326 -> dst), all
vectorized numpy over coordinate arrays.  Unknown EPSG codes raise
ValueError — loud, not silently wrong.
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


# -- Lambert conformal conic (2SP) and Albers equal-area (Snyder 1987) ----------

_GRS80_A = 6378137.0
_GRS80_E = np.sqrt(1.0 - (6356752.314140356 / 6378137.0) ** 2)


class ConicCRS:
    """Parameters of a conic projection (LCC or Albers).

    2SP when lat1 != lat2; passing lat1 == lat2 selects the 1SP limit
    (n = sin(lat1)) with the published scale factor ``k0`` — the EPSG
    "Lambert Conic Conformal (1SP)" method (9801), e.g. the French legacy
    Lambert zones.  ``datum``/``unit`` mirror TMCRS (Helmert shift from
    WGS84; meters per output unit)."""

    __slots__ = ("kind", "a", "e", "lat1", "lat2", "lat0", "lon0", "fe", "fn",
                 "n", "big_f", "rho0", "big_c", "k0", "unit", "datum")

    def __init__(self, kind, lat1, lat2, lat0, lon0, fe, fn, a=_GRS80_A, e=_GRS80_E,
                 k0=1.0, unit=1.0, datum=None):
        self.kind, self.a, self.e = kind, a, e
        self.lat1, self.lat2, self.lat0, self.lon0 = lat1, lat2, lat0, lon0
        self.fe, self.fn = fe, fn
        self.k0, self.unit, self.datum = k0, unit, datum
        p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
        ak = self.a * self.k0
        if kind == "lcc":
            m1, m2 = self._m(p1), self._m(p2)
            t1, t2, t0 = self._t(p1), self._t(p2), self._t(p0)
            if lat1 == lat2:  # 1SP limit (Snyder 15-17 with k0)
                self.n = np.sin(p1)
            else:
                self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
            self.big_f = m1 / (self.n * t1**self.n)
            self.rho0 = ak * self.big_f * t0**self.n
            self.big_c = None
        else:  # albers
            m1, m2 = self._m(p1), self._m(p2)
            q1, q2, q0 = self._q(p1), self._q(p2), self._q(p0)
            if lat1 == lat2:
                self.n = np.sin(p1)
            else:
                self.n = (m1**2 - m2**2) / (q2 - q1)
            self.big_c = m1**2 + self.n * q1
            self.rho0 = ak * np.sqrt(self.big_c - self.n * q0) / self.n
            self.big_f = None

    def _m(self, phi):
        return np.cos(phi) / np.sqrt(1 - (self.e * np.sin(phi)) ** 2)

    def _t(self, phi):
        es = self.e * np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (self.e / 2)

    def _q(self, phi):
        s = np.sin(phi)
        es = self.e * s
        return (1 - self.e**2) * (
            s / (1 - es**2) - np.log((1 - es) / (1 + es)) / (2 * self.e)
        )

    # forward/inverse take degree arrays, return output units (and vice versa)
    def forward(self, lon_deg, lat_deg):
        if self.datum is not None:
            lon_deg, lat_deg = self.datum.from_wgs84(lon_deg, lat_deg)
        lam = np.radians(np.asarray(lon_deg, np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat_deg, np.float64))
        theta = self.n * lam
        ak = self.a * self.k0
        if self.kind == "lcc":
            rho = ak * self.big_f * self._t(phi) ** self.n
        else:
            rho = ak * np.sqrt(self.big_c - self.n * self._q(phi)) / self.n
        return (
            (self.fe + rho * np.sin(theta)) / self.unit,
            (self.fn + self.rho0 - rho * np.cos(theta)) / self.unit,
        )

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) * self.unit - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) * self.unit - self.fn)
        sgn = np.sign(self.n) or 1.0
        rho = sgn * np.sqrt(dx * dx + dy * dy)
        theta = np.arctan2(sgn * dx, sgn * dy)
        lon = self.lon0 + np.degrees(theta / self.n)
        ak = self.a * self.k0
        if self.kind == "lcc":
            tp = (rho / (ak * self.big_f)) ** (1.0 / self.n)
            phi = np.pi / 2 - 2 * np.arctan(tp)
            for _ in range(8):
                es = self.e * np.sin(phi)
                phi = np.pi / 2 - 2 * np.arctan(tp * ((1 - es) / (1 + es)) ** (self.e / 2))
        else:
            q = (self.big_c - (rho * self.n / ak) ** 2) / self.n
            phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
            e2 = self.e**2
            for _ in range(10):  # Snyder eq 3-16
                s = np.sin(phi)
                es = self.e * s
                phi = phi + (1 - es**2) ** 2 / (2 * np.cos(phi) * (1 - e2)) * (
                    q / (1 - e2) - s / (1 - es**2) + np.log((1 - es) / (1 + es)) / (2 * self.e)
                )
        lat = np.degrees(phi)
        if self.datum is not None:
            lon, lat = self.datum.to_wgs84(lon, lat)
        return lon, lat


# Registry of conic CRSs: (kind, lat1, lat2, lat0, lon0, FE, FN) — EPSG
# parameter sets; all on GRS80.
_CONIC = {
    2154: ConicCRS("lcc", 44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0),
    3347: ConicCRS("lcc", 49.0, 77.0, 63.390675, -91.866667, 6200000.0, 3000000.0),
    5070: ConicCRS("albers", 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    3310: ConicCRS("albers", 34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0),
    # NAD83 state-plane (meter-based codes), LCC 2SP — EPSG parameter sets
    26985: ConicCRS("lcc", 38.3, 39.45, 37.666666666666664, -77.0, 400000.0, 0.0),  # Maryland
}


# -- general Transverse Mercator (per-ellipsoid Krueger series + datum shift) ---


class Ellipsoid:
    """Krueger-series constants for an arbitrary ellipsoid (same order-n^4
    series as the module-level WGS84 constants above)."""

    __slots__ = ("a", "f", "e", "n", "a_bar", "alpha", "beta", "delta")

    def __init__(self, a: float, f: float):
        self.a, self.f = a, f
        self.e = np.sqrt(f * (2.0 - f))
        n = f / (2.0 - f)
        self.n = n
        self.a_bar = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
        self.alpha = (
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
            61 * n**3 / 240 - 103 * n**4 / 140,
            49561 * n**4 / 161280,
        )
        self.beta = (
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440,
            17 * n**3 / 480 - 37 * n**4 / 840,
            4397 * n**4 / 161280,
        )
        self.delta = (
            2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45,
            7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45,
            56 * n**3 / 15 - 136 * n**4 / 35,
            4279 * n**4 / 630,
        )


_ELL_WGS84 = Ellipsoid(6378137.0, 1.0 / 298.257223563)
_ELL_GRS80 = Ellipsoid(6378137.0, 1.0 / 298.257222101)
_ELL_AIRY = Ellipsoid(6377563.396, 1.0 / 299.3249646)


class Helmert:
    """7-parameter Helmert datum shift FROM WGS84 (position-vector sign
    convention; tx/ty/tz meters, rx/ry/rz arc-seconds, s ppm).  Standard
    small-angle form; national grid-shift files (e.g. OSTN15) are more
    accurate — this is the published single-transform parameter set (~2 m
    for OSGB36), applied and documented loudly, not silently."""

    __slots__ = ("t", "r", "s", "ell")

    def __init__(self, tx, ty, tz, rx_as, ry_as, rz_as, s_ppm, ell: Ellipsoid):
        self.t = np.array([tx, ty, tz])
        as2r = np.pi / (180.0 * 3600.0)
        self.r = np.array([rx_as * as2r, ry_as * as2r, rz_as * as2r])
        self.s = s_ppm * 1e-6
        self.ell = ell

    @staticmethod
    def _to_ecef(lon_deg, lat_deg, ell: Ellipsoid):
        lon = np.radians(np.asarray(lon_deg, np.float64))
        lat = np.radians(np.asarray(lat_deg, np.float64))
        e2 = ell.e**2
        nu = ell.a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
        x = nu * np.cos(lat) * np.cos(lon)
        y = nu * np.cos(lat) * np.sin(lon)
        z = nu * (1 - e2) * np.sin(lat)
        return x, y, z

    @staticmethod
    def _from_ecef(x, y, z, ell: Ellipsoid):
        e2 = ell.e**2
        lon = np.arctan2(y, x)
        p = np.sqrt(x * x + y * y)
        lat = np.arctan2(z, p * (1 - e2))
        for _ in range(6):
            nu = ell.a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
            lat = np.arctan2(z + e2 * nu * np.sin(lat), p)
        return np.degrees(lon), np.degrees(lat)

    def _apply(self, x, y, z, inverse: bool):
        rx, ry, rz = (-self.r if inverse else self.r)
        s = -self.s if inverse else self.s
        t = -self.t if inverse else self.t
        xs = t[0] + (1 + s) * x - rz * y + ry * z
        ys = t[1] + rz * x + (1 + s) * y - rx * z
        zs = t[2] - ry * x + rx * y + (1 + s) * z
        return xs, ys, zs

    def from_wgs84(self, lon_deg, lat_deg):
        x, y, z = self._to_ecef(lon_deg, lat_deg, _ELL_WGS84)
        return self._from_ecef(*self._apply(x, y, z, False), self.ell)

    def to_wgs84(self, lon_deg, lat_deg):
        x, y, z = self._to_ecef(lon_deg, lat_deg, self.ell)
        return self._from_ecef(*self._apply(x, y, z, True), _ELL_WGS84)


# OSGB36 <- WGS84 (OS "A guide to coordinate systems in GB", single Helmert)
_OSGB36 = Helmert(-446.448, 125.157, -542.060, -0.1502, -0.2470, -0.8421,
                  20.4894, _ELL_AIRY)


class GridShift:
    """Projected-space grid correction — the OSTN15 mechanism.

    National grid transformations (OSTN15 for EPSG 27700, NTv2 derivatives
    elsewhere) publish easting/northing shift surfaces sampled on a regular
    grid over the PROJECTED plane: E_local = E_hub + dE(E, N),
    N_local = N_hub + dN(E, N), bilinear interpolation between nodes.
    This class carries one such extract: node (0,0) at (e0, n0), spacing
    ``step`` meters, ``de``/``dn`` 2-D arrays indexed [row=n, col=e].

    The engine cannot ship the real OSTN15 tables (no network in this
    sandbox); a user loads the public OS data into this class (it is a
    plain CSV of node shifts) and attaches it via register_tm_crs
    (grid_shift=...).  The interpolation/application machinery is exact
    and tested against an analytic synthetic surface; coverage is loud —
    points outside the extract raise rather than silently falling back.
    """

    __slots__ = ("e0", "n0", "step", "de", "dn")

    def __init__(self, e0: float, n0: float, step: float, de, dn):
        self.e0, self.n0, self.step = e0, n0, step
        self.de = np.asarray(de, dtype=np.float64)
        self.dn = np.asarray(dn, dtype=np.float64)
        if self.de.shape != self.dn.shape or self.de.ndim != 2:
            raise ValueError("GridShift: de/dn must be equal-shape 2-D arrays")

    def interp(self, e, n):
        ge = (np.asarray(e, np.float64) - self.e0) / self.step
        gn = (np.asarray(n, np.float64) - self.n0) / self.step
        rows, cols = self.de.shape
        if np.any(ge < 0) or np.any(gn < 0) or np.any(ge > cols - 1) or np.any(gn > rows - 1):
            raise ValueError(
                "GridShift: point outside the committed grid extract "
                f"(covers E [{self.e0}, {self.e0 + (cols - 1) * self.step}], "
                f"N [{self.n0}, {self.n0 + (rows - 1) * self.step}])"
            )
        i0 = np.minimum(np.floor(ge).astype(np.int64), cols - 2)
        j0 = np.minimum(np.floor(gn).astype(np.int64), rows - 2)
        fx = ge - i0
        fy = gn - j0
        out = []
        for g in (self.de, self.dn):
            v = (
                g[j0, i0] * (1 - fx) * (1 - fy)
                + g[j0, i0 + 1] * fx * (1 - fy)
                + g[j0 + 1, i0] * (1 - fx) * fy
                + g[j0 + 1, i0 + 1] * fx * fy
            )
            out.append(v)
        return out[0], out[1]

    def apply(self, e, n):
        de, dn = self.interp(e, n)
        return np.asarray(e, np.float64) + de, np.asarray(n, np.float64) + dn

    def unapply(self, e, n, iters: int = 3):
        """Inverse by fixed-point: shifts are ~100 m with ~1e-5 gradients,
        so 2-3 iterations land far below the OSTN15 noise floor."""
        e_out = np.asarray(e, np.float64) - self.de.mean()
        n_out = np.asarray(n, np.float64) - self.dn.mean()
        for _ in range(iters):
            de, dn = self.interp(e_out, n_out)
            e_out = np.asarray(e, np.float64) - de
            n_out = np.asarray(n, np.float64) - dn
        return e_out, n_out


class TMCRS:
    """General Transverse Mercator CRS: per-ellipsoid Krueger series,
    latitude-of-origin offset, optional Helmert datum, optional output unit,
    optional projected-space GridShift (the OSTN15 pipeline: when set, the
    hub lon/lat is projected directly — no Helmert — and the grid correction
    lands on the projected plane, which is exactly how OSGB defines
    ETRS89 -> OSGB36/ODN; the Helmert stays the fallback elsewhere).

    The latitude of natural origin enters as the meridian-arc northing at
    (lat0, lon0) computed through the same series, so FN is relative to it
    exactly as EPSG defines."""

    __slots__ = ("ell", "lat0", "lon0", "k0", "fe", "fn", "unit", "datum",
                 "grid_shift", "_y0")

    def __init__(self, ell, lat0, lon0, k0, fe, fn, unit=1.0, datum=None,
                 grid_shift=None):
        self.ell, self.lat0, self.lon0, self.k0 = ell, lat0, lon0, k0
        self.fe, self.fn, self.unit, self.datum = fe, fn, unit, datum
        self.grid_shift = grid_shift
        self._y0 = self._tm_fwd(np.array([lon0]), np.array([lat0]))[1][0]

    def _tm_fwd(self, lon_deg, lat_deg):
        ell = self.ell
        lam = np.radians(np.asarray(lon_deg, np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat_deg, np.float64))
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - ell.e * np.arctanh(ell.e * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, a in enumerate(ell.alpha, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return self.k0 * ell.a_bar * eta, self.k0 * ell.a_bar * xi

    def _tm_inv(self, x, y):
        ell = self.ell
        xi = np.asarray(y, np.float64) / (self.k0 * ell.a_bar)
        eta = np.asarray(x, np.float64) / (self.k0 * ell.a_bar)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, b in enumerate(ell.beta, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
        phi = chi.copy()
        for j, d in enumerate(ell.delta, start=1):
            phi += d * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return self.lon0 + np.degrees(lam), np.degrees(phi)

    def forward(self, lon_deg, lat_deg):
        if self.grid_shift is not None:
            # OSTN15 pipeline: project the hub coordinates directly, then
            # apply the grid correction on the projected plane
            x, y = self._tm_fwd(lon_deg, lat_deg)
            e = self.fe + x
            n = self.fn + (y - self._y0)
            e, n = self.grid_shift.apply(e, n)
            return e / self.unit, n / self.unit
        if self.datum is not None:
            lon_deg, lat_deg = self.datum.from_wgs84(lon_deg, lat_deg)
        x, y = self._tm_fwd(lon_deg, lat_deg)
        return (
            (self.fe + x) / self.unit,
            (self.fn + (y - self._y0)) / self.unit,
        )

    def inverse(self, x, y):
        if self.grid_shift is not None:
            e, n = self.grid_shift.unapply(
                np.asarray(x, np.float64) * self.unit,
                np.asarray(y, np.float64) * self.unit,
            )
            return self._tm_inv(e - self.fe, n - self.fn + self._y0)
        xm = np.asarray(x, np.float64) * self.unit - self.fe
        ym = np.asarray(y, np.float64) * self.unit - self.fn + self._y0
        lon, lat = self._tm_inv(xm, ym)
        if self.datum is not None:
            lon, lat = self.datum.to_wgs84(lon, lat)
        return lon, lat


_TM = {
    # OSGB36 / British National Grid (Airy 1830 + published Helmert, ~2 m
    # vs the OSTN15 grid shift — documented approximation, not silent)
    27700: TMCRS(_ELL_AIRY, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
                 datum=_OSGB36),
    # NZGD2000 / New Zealand Transverse Mercator (GRS80, null datum)
    2193: TMCRS(_ELL_GRS80, 0.0, 173.0, 0.9996, 1600000.0, 10000000.0),
}
# ETRS89 / UTM zones 28N-38N (25828-25838) and NAD83 / UTM zones 1N-23N
# (26901-26923): standard UTM on GRS80, null datum to WGS84 (<0.1 mm ellipsoid
# delta; the ETRS89/NAD83 plate-fixed drift vs WGS84 is a documented ~0.5-1 m
# epoch effect, the standard null-transform assumption also used for 2154/5070)
for _z in range(28, 39):
    _TM[25800 + _z] = TMCRS(_ELL_GRS80, 0.0, utm_zone_lon0(_z), _K0_UTM, _FE_UTM, 0.0)
for _z in range(1, 24):
    _TM[26900 + _z] = TMCRS(_ELL_GRS80, 0.0, utm_zone_lon0(_z), _K0_UTM, _FE_UTM, 0.0)


class PolarCRS:
    """Polar stereographic (Snyder 1987 p.160-162, ellipsoidal).

    Variant B (EPSG 9829): parameterized by the standard parallel lat_ts.
    Variant A (EPSG 9810, the UPS pair): parameterized by k0 at the pole.
    The south aspect is the north formulas on -lat with the y term mirrored.
    """

    __slots__ = ("south", "lon0", "fe", "fn", "a", "e", "rho_scale")

    def __init__(self, lat_ts=None, k0=None, lon0=0.0, fe=0.0, fn=0.0,
                 south=False, a=_A, e=_E):
        self.south, self.lon0, self.fe, self.fn, self.a, self.e = (
            south, lon0, fe, fn, a, e)
        if lat_ts is not None:  # variant B: rho = a * mc/tc * t
            pc = np.radians(abs(lat_ts))
            mc = np.cos(pc) / np.sqrt(1 - (e * np.sin(pc)) ** 2)
            es = e * np.sin(pc)
            tc = np.tan(np.pi / 4 - pc / 2) / ((1 - es) / (1 + es)) ** (e / 2)
            self.rho_scale = a * mc / tc
        else:  # variant A: rho = 2 a k0 t / sqrt((1+e)^(1+e) (1-e)^(1-e))
            self.rho_scale = (
                2.0 * a * k0 / np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
            )

    def _t(self, phi):
        es = self.e * np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / ((1 - es) / (1 + es)) ** (self.e / 2)

    def forward(self, lon_deg, lat_deg):
        lon = np.asarray(lon_deg, np.float64)
        lat = np.asarray(lat_deg, np.float64)
        phi = np.radians(-lat if self.south else lat)
        lam = np.radians((-lon if self.south else lon) - (-self.lon0 if self.south else self.lon0))
        rho = self.rho_scale * self._t(phi)
        x = rho * np.sin(lam)
        y = -rho * np.cos(lam)
        if self.south:
            x, y = -x, -y
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = np.asarray(y, np.float64) - self.fn
        if self.south:
            dx, dy = -dx, -dy
        rho = np.sqrt(dx * dx + dy * dy)
        lam = np.arctan2(dx, -dy)
        t = rho / self.rho_scale
        phi = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):
            es = self.e * np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(t * ((1 - es) / (1 + es)) ** (self.e / 2))
        lon = np.degrees(lam) + (-self.lon0 if self.south else self.lon0)
        lat = np.degrees(phi)
        if self.south:
            lon, lat = -lon, -lat
        lon = (lon + 180.0) % 360.0 - 180.0  # wrap into (-180, 180]
        return lon, lat


class LAEACRS:
    """Lambert azimuthal equal-area, ellipsoidal oblique aspect (Snyder 1987
    eqs 3-11/3-12, 24-2..24-16; EPSG method 9820) — EPSG 3035 ETRS89 / LAEA
    Europe is the EU's standard statistical grid."""

    __slots__ = ("a", "e", "lat0", "lon0", "fe", "fn", "qp", "beta0", "rq", "d")

    def __init__(self, lat0, lon0, fe, fn, a=_GRS80_A, e=_GRS80_E):
        self.a, self.e = a, e
        self.lat0, self.lon0, self.fe, self.fn = lat0, lon0, fe, fn
        p0 = np.radians(lat0)
        self.qp = self._q(np.pi / 2)
        self.beta0 = np.arcsin(self._q(p0) / self.qp)
        self.rq = a * np.sqrt(self.qp / 2.0)
        m0 = np.cos(p0) / np.sqrt(1 - (e * np.sin(p0)) ** 2)
        self.d = a * m0 / (self.rq * np.cos(self.beta0))

    def _q(self, phi):
        s = np.sin(phi)
        es = self.e * s
        return (1 - self.e**2) * (
            s / (1 - es**2) - np.log((1 - es) / (1 + es)) / (2 * self.e)
        )

    def forward(self, lon_deg, lat_deg):
        lam = np.radians(np.asarray(lon_deg, np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat_deg, np.float64))
        beta = np.arcsin(np.clip(self._q(phi) / self.qp, -1.0, 1.0))
        b = self.rq * np.sqrt(
            2.0
            / (1 + np.sin(self.beta0) * np.sin(beta)
               + np.cos(self.beta0) * np.cos(beta) * np.cos(lam))
        )
        x = b * self.d * np.cos(beta) * np.sin(lam)
        y = (b / self.d) * (
            np.cos(self.beta0) * np.sin(beta)
            - np.sin(self.beta0) * np.cos(beta) * np.cos(lam)
        )
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        xs = (np.asarray(x, np.float64) - self.fe) / self.d
        ys = (np.asarray(y, np.float64) - self.fn) * self.d
        rho = np.sqrt(xs * xs + ys * ys)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.rq), -1.0, 1.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            q = self.qp * (
                np.cos(ce) * np.sin(self.beta0)
                + ys * np.sin(ce) * np.cos(self.beta0) / rho
            )
            lam = np.arctan2(
                xs * np.sin(ce),
                rho * np.cos(self.beta0) * np.cos(ce)
                - ys * np.sin(self.beta0) * np.sin(ce),
            )
        q = np.where(rho == 0.0, self.qp * np.sin(np.radians(self.lat0)), q)
        lam = np.where(rho == 0.0, 0.0, lam)
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        e2 = self.e**2
        for _ in range(10):  # Snyder eq 3-16
            s = np.sin(phi)
            es = self.e * s
            phi = phi + (1 - es**2) ** 2 / (2 * np.cos(phi) * (1 - e2)) * (
                q / (1 - e2) - s / (1 - es**2) + np.log((1 - es) / (1 + es)) / (2 * self.e)
            )
        return self.lon0 + np.degrees(lam), np.degrees(phi)


_LAEA: dict[int, LAEACRS] = {
    # ETRS89-extended / LAEA Europe (EPSG 3035)
    3035: LAEACRS(52.0, 10.0, 4321000.0, 3210000.0),
}


_POLAR = {
    3031: PolarCRS(lat_ts=-71.0, lon0=0.0, south=True),    # WGS84 Antarctic PS
    3413: PolarCRS(lat_ts=70.0, lon0=-45.0),               # NSIDC Arctic PS
    3995: PolarCRS(lat_ts=71.0, lon0=0.0),                 # Arctic PS
    5041: PolarCRS(k0=0.994, lon0=0.0, fe=2000000.0, fn=2000000.0),        # UPS N
    5042: PolarCRS(k0=0.994, lon0=0.0, fe=2000000.0, fn=2000000.0, south=True),  # UPS S
}


class OMCRS:
    """Hotine Oblique Mercator, variant B (EPSG method 9815; Snyder 1987
    p.66-75) — the SPCS83 Alaska zone 1 / RSO Borneo formula family, the
    one conic/cylindrical family the registry previously lacked.

    Variant B: the false easting/northing apply AT THE PROJECTION CENTRE
    (EPSG GN7-2 names Alaska zone 1 as its defining example), so
    forward(lon_c, lat_c) == (FE, FN) exactly — the same definition-point
    property every other family here is tested on.  Parameters: centre
    (lat_c, lon_c), azimuth alpha_c of the initial line at the centre,
    rectified-grid angle gamma_c, scale kc on the initial line.
    alpha_c == +-90 (the Hungarian EOV special case) is rejected loudly.
    Verified against the EPSG worked example (Timbalai 1948 / RSO Borneo)
    to centimetres and by scale-factor physics at the centre."""

    __slots__ = ("ell", "latc", "lonc", "alphac", "gammac", "kc", "fe", "fn",
                 "datum", "B", "A", "lam0", "gam0", "H", "uc", "_sphic")

    def __init__(self, ell, latc, lonc, alphac, gammac, kc, fe, fn, datum=None):
        if abs(abs(alphac) - 90.0) < 1e-9:
            raise ValueError("alpha_c == +-90 (EOV form) not implemented; "
                             "use a dedicated registration")
        self.ell, self.latc, self.lonc = ell, latc, lonc
        self.alphac, self.gammac, self.kc = alphac, gammac, kc
        self.fe, self.fn, self.datum = fe, fn, datum
        a, e = ell.a, ell.e
        e2 = e * e
        phic = np.radians(latc)
        alc = np.radians(alphac)
        sphic, cphic = np.sin(phic), np.cos(phic)
        self._sphic = 1.0 if latc >= 0 else -1.0
        B = np.sqrt(1.0 + e2 * cphic**4 / (1.0 - e2))
        A = a * B * kc * np.sqrt(1.0 - e2) / (1.0 - e2 * sphic**2)
        t0 = np.tan(np.pi / 4 - phic / 2) / (
            (1 - e * sphic) / (1 + e * sphic)
        ) ** (e / 2)
        D = B * np.sqrt(1.0 - e2) / (cphic * np.sqrt(1.0 - e2 * sphic**2))
        D2 = max(D * D, 1.0)
        F = D + np.sqrt(D2 - 1.0) * self._sphic
        self.H = F * t0**B
        G = (F - 1.0 / F) / 2.0
        self.gam0 = np.arcsin(np.sin(alc) / D)
        self.lam0 = np.radians(lonc) - np.arcsin(G * np.tan(self.gam0)) / B
        self.uc = (A / B) * np.arctan2(np.sqrt(D2 - 1.0), np.cos(alc)) * self._sphic
        self.B, self.A = B, A

    def _t(self, phi):
        e = self.ell.e
        s = np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)

    def forward(self, lon_deg, lat_deg):
        if self.datum is not None:
            lon_deg, lat_deg = self.datum.from_wgs84(lon_deg, lat_deg)
        B, A = self.B, self.A
        phi = np.radians(np.asarray(lat_deg, np.float64))
        lam = np.radians(np.asarray(lon_deg, np.float64))
        Q = self.H / self._t(phi) ** B
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        dl = B * (lam - self.lam0)
        V = np.sin(dl)
        U = (-V * np.cos(self.gam0) + S * np.sin(self.gam0)) / T
        v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
        u = (
            A * np.arctan2(S * np.cos(self.gam0) + V * np.sin(self.gam0), np.cos(dl)) / B
            - abs(self.uc) * self._sphic
        )
        gc = np.radians(self.gammac)
        return (
            v * np.cos(gc) + u * np.sin(gc) + self.fe,
            u * np.cos(gc) - v * np.sin(gc) + self.fn,
        )

    def inverse(self, x, y):
        B, A = self.B, self.A
        gc = np.radians(self.gammac)
        dx = np.asarray(x, np.float64) - self.fe
        dy = np.asarray(y, np.float64) - self.fn
        vp = dx * np.cos(gc) - dy * np.sin(gc)
        up = dy * np.cos(gc) + dx * np.sin(gc) + abs(self.uc) * self._sphic
        Qp = np.exp(-B * vp / A)
        Sp = (Qp - 1.0 / Qp) / 2.0
        Tp = (Qp + 1.0 / Qp) / 2.0
        Vp = np.sin(B * up / A)
        Up = (Vp * np.cos(self.gam0) + Sp * np.sin(self.gam0)) / Tp
        tp = (self.H / np.sqrt((1.0 + Up) / (1.0 - Up))) ** (1.0 / B)
        chi = np.pi / 2 - 2.0 * np.arctan(tp)
        e2 = self.ell.e**2
        e4, e6, e8 = e2 * e2, e2**3, e2**4
        phi = (
            chi
            + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * np.sin(2 * chi)
            + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * np.sin(4 * chi)
            + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
            + (4279 * e8 / 161280) * np.sin(8 * chi)
        )
        lam = self.lam0 - np.arctan2(
            Sp * np.cos(self.gam0) - Vp * np.sin(self.gam0), np.cos(B * up / A)
        ) / B
        lon, lat = np.degrees(lam), np.degrees(phi)
        if self.datum is not None:
            lon, lat = self.datum.to_wgs84(lon, lat)
        return lon, lat


_OM: dict[int, OMCRS] = {
    # NAD83 / Alaska zone 1 (SPCS83; the zone the LCC/TM state-plane batch
    # could not cover).  Azimuth/rectified angle are EPSG's published DMS
    # (= arctan(-3/4), the Panhandle's design line).
    26931: OMCRS(
        _ELL_GRS80, 57.0, -(133.0 + 40.0 / 60.0),
        -(36.0 + 52.0 / 60.0 + 11.6315 / 3600.0),
        -(36.0 + 52.0 / 60.0 + 11.6315 / 3600.0),
        0.9999, 5000000.0, -5000000.0,
    ),
}


def register_om_crs(
    code: int,
    lat_c: float,
    lon_c: float,
    alpha_c: float,
    gamma_c: float,
    k_c: float,
    false_easting: float,
    false_northing: float,
    ellipsoid: str = "GRS80",
    helmert: tuple | None = None,
) -> None:
    """Register a Hotine Oblique Mercator (variant B) CRS at runtime —
    see register_tm_crs."""
    ell = ELLIPSOIDS[ellipsoid]
    datum = Helmert(*helmert, ell) if helmert is not None else None
    _OM[int(code)] = OMCRS(
        ell, lat_c, lon_c, alpha_c, gamma_c, k_c,
        false_easting, false_northing, datum=datum,
    )


# -- user-extensible registry --------------------------------------------------

ELLIPSOIDS = {
    "WGS84": _ELL_WGS84,
    "GRS80": _ELL_GRS80,
    "airy1830": _ELL_AIRY,
    "intl1924": Ellipsoid(6378388.0, 1.0 / 297.0),
    "clarke1866": Ellipsoid(6378206.4, 1.0 / 294.978698214),
    "bessel1841": Ellipsoid(6377397.155, 1.0 / 299.1528128),
}


def register_tm_crs(
    code: int,
    lat0: float,
    lon0: float,
    k0: float,
    false_easting: float,
    false_northing: float,
    ellipsoid: str = "GRS80",
    unit: float = 1.0,
    helmert: tuple | None = None,
    grid_shift: "GridShift | None" = None,
) -> None:
    """Register a Transverse Mercator CRS under ``epsg:<code>`` at runtime.

    The built-in registry covers the high-traffic codes; any remaining TM
    grid (state planes, national grids) is one call with its published EPSG
    parameters — the engine's answer to the reference's full GeoTools EPSG
    database (Functions.java:184-189) without shipping one.  ``unit``:
    meters per output unit (0.3048006096012192 for US survey feet).
    ``helmert``: optional (tx, ty, tz, rx", ry", rz", s_ppm) position-vector
    datum shift FROM WGS84 (see the OSGB36 entry).  ``grid_shift``: optional
    GridShift with a national correction-grid extract (e.g. OSTN15 for
    27700); when set it REPLACES the Helmert path — project the hub
    coordinates, then add the interpolated (dE, dN).
    """
    ell = ELLIPSOIDS[ellipsoid]
    datum = Helmert(*helmert, ell) if helmert is not None else None
    _TM[int(code)] = TMCRS(
        ell, lat0, lon0, k0, false_easting, false_northing, unit=unit,
        datum=datum, grid_shift=grid_shift,
    )


def register_conic_crs(
    code: int,
    kind: str,
    lat1: float,
    lat2: float,
    lat0: float,
    lon0: float,
    false_easting: float,
    false_northing: float,
    ellipsoid: str = "GRS80",
    k0: float = 1.0,
    unit: float = 1.0,
    helmert: tuple | None = None,
) -> None:
    """Register a conic CRS (``kind`` = "lcc" or "albers") under
    ``epsg:<code>`` at runtime — see register_tm_crs.  ``lat1 == lat2``
    selects the 1SP form with scale factor ``k0`` (EPSG method 9801)."""
    if kind not in ("lcc", "albers"):
        raise ValueError(f"kind must be 'lcc' or 'albers', got {kind!r}")
    ell = ELLIPSOIDS[ellipsoid]
    datum = Helmert(*helmert, ell) if helmert is not None else None
    _CONIC[int(code)] = ConicCRS(
        kind, lat1, lat2, lat0, lon0, false_easting, false_northing,
        a=ell.a, e=ell.e, k0=k0, unit=unit, datum=datum,
    )


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
    if code in _CONIC:
        return ("conic", code)
    if code in _POLAR:
        return ("polar", code)
    if code in _TM:
        return ("tm", code)
    if code in _LAEA:
        return ("laea", code)
    if code in _OM:
        return ("om", code)
    raise ValueError(
        f"unsupported CRS {crs!r} (supported: 4326, 3857, UTM 326NN/327NN, "
        f"conic {sorted(_CONIC)}, polar {sorted(_POLAR)}, "
        f"laea {sorted(_LAEA)}, om {sorted(_OM)}, tm-grid {sorted(_TM)}; "
        "any other code is one register_tm_crs/register_conic_crs/"
        "register_om_crs call with its published EPSG parameters)"
    )


def transform_xy(x, y, src: str, dst: str):
    """Transform coordinate arrays src -> dst (through 4326 as hub)."""
    s, d = _parse(src), _parse(dst)
    if s[0] == "geo":
        lon, lat = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    elif s[0] == "merc":
        lon, lat = merc_inverse(x, y)
    elif s[0] == "conic":
        lon, lat = _CONIC[s[1]].inverse(x, y)
    elif s[0] == "polar":
        lon, lat = _POLAR[s[1]].inverse(x, y)
    elif s[0] == "tm":
        lon, lat = _TM[s[1]].inverse(x, y)
    elif s[0] == "laea":
        lon, lat = _LAEA[s[1]].inverse(x, y)
    elif s[0] == "om":
        lon, lat = _OM[s[1]].inverse(x, y)
    else:
        lon, lat = tm_inverse(x, y, utm_zone_lon0(s[1]), _K0_UTM, _FE_UTM, s[2])
    if d[0] == "geo":
        return lon, lat
    if d[0] == "merc":
        return merc_forward(lon, lat)
    if d[0] == "conic":
        return _CONIC[d[1]].forward(lon, lat)
    if d[0] == "polar":
        return _POLAR[d[1]].forward(lon, lat)
    if d[0] == "tm":
        return _TM[d[1]].forward(lon, lat)
    if d[0] == "laea":
        return _LAEA[d[1]].forward(lon, lat)
    if d[0] == "om":
        return _OM[d[1]].forward(lon, lat)
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


# -- bulk EPSG batches (published parameter sets; see crs_tables.py) -----------
from incubator_sedona_spark.functions import crs_tables as _crs_tables  # noqa: E402

_crs_tables.load_builtin_batches(register_tm_crs, register_conic_crs, ELLIPSOIDS)
