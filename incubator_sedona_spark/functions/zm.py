"""Z/M-coordinate accessors and constructors.

Reference surface: ST_Z / ST_ZMin / ST_ZMax / ST_NDims / ST_HasZ / ST_HasM /
ST_Force3D / ST_3DDistance (Catalog.scala:58-161; serde parity
GeometrySerializer.java:87-101).  The planar kernels stay strictly 2-D (as
JTS's predicates do); these functions read/write the extra coordinate
columns the WKB serde carries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import BinaryType, BooleanType, DoubleType, IntegerType

from incubator_sedona_spark.geom import wkb as W


def _scalar_udf(fn, rettype):
    @F.pandas_udf(rettype)
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([fn(W.loads(b)) for b in s])

    return _f


def st_z(wkb_col: Column) -> Column:
    """Z of a Point (null for non-points or 2-D points), like ST_Z."""

    def _z(g: W.Geometry):
        if g.kind == W.POINT and g.has_z:
            return float(g.parts[0, 2])
        return None

    return _scalar_udf(_z, DoubleType())(wkb_col)


def st_m(wkb_col: Column) -> Column:
    """M of a Point (null when absent)."""

    def _m(g: W.Geometry):
        if g.kind == W.POINT and g.has_m:
            return float(g.parts[0, 2 + int(g.has_z)])
        return None

    return _scalar_udf(_m, DoubleType())(wkb_col)


def st_zmin(wkb_col: Column) -> Column:
    def _f(g: W.Geometry):
        z = g.z_values()
        return float(z.min()) if len(z) else None

    return _scalar_udf(_f, DoubleType())(wkb_col)


def st_zmax(wkb_col: Column) -> Column:
    def _f(g: W.Geometry):
        z = g.z_values()
        return float(z.max()) if len(z) else None

    return _scalar_udf(_f, DoubleType())(wkb_col)


def st_ndims(wkb_col: Column) -> Column:
    return _scalar_udf(lambda g: g.ndims, IntegerType())(wkb_col)


def st_hasz(wkb_col: Column) -> Column:
    return _scalar_udf(lambda g: bool(g.has_z), BooleanType())(wkb_col)


def st_hasm(wkb_col: Column) -> Column:
    return _scalar_udf(lambda g: bool(g.has_m), BooleanType())(wkb_col)


def force_3d_geometry(g: W.Geometry, z: float = 0.0) -> W.Geometry:
    """Add a Z column holding ``z`` to every vertex (existing Z preserved)."""
    if g.has_z:
        return g
    if g.kind in (W.POINT, W.LINESTRING):
        zc = np.full((len(g.parts), 1), z)
        arr = np.column_stack([g.parts[:, :2], zc] + ([g.parts[:, 2:]] if g.has_m else []))
        return W.Geometry(g.kind, arr, True, g.has_m)
    if g.kind == W.POLYGON:
        rings = []
        for r in g.parts:
            zc = np.full((len(r), 1), z)
            rings.append(
                np.column_stack([r[:, :2], zc] + ([r[:, 2:]] if g.has_m else []))
            )
        return W.Geometry(W.POLYGON, rings, True, g.has_m)
    return W.Geometry(
        g.kind, [force_3d_geometry(c, z) for c in g.parts], True, g.has_m
    )


def st_force_3d(wkb_col: Column, z: float = 0.0) -> Column:
    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([W.dumps(force_3d_geometry(W.loads(b), z)) for b in s])

    return _f(wkb_col)


def st_3ddistance(a_col: Column, b_col: Column) -> Column:
    """Euclidean XYZ distance between two POINTS (2-D points get z=0),
    matching ST_3DDistance's point case.  Non-point inputs raise loudly —
    the general JTS Distance3DOp (segment/facet distance) is not implemented;
    use ST_Distance for planar geometry."""

    @F.pandas_udf(DoubleType())
    def _f(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for ba, bb in zip(sa, sb):
            ga, gb = W.loads(ba), W.loads(bb)
            if ga.kind != W.POINT or gb.kind != W.POINT:
                raise NotImplementedError(
                    "ST_3DDistance is implemented for Point inputs only"
                )
            za = float(ga.parts[0, 2]) if ga.has_z else 0.0
            zb = float(gb.parts[0, 2]) if gb.has_z else 0.0
            dx = float(ga.parts[0, 0] - gb.parts[0, 0])
            dy = float(ga.parts[0, 1] - gb.parts[0, 1])
            out.append(float(np.sqrt(dx * dx + dy * dy + (za - zb) ** 2)))
        return pd.Series(out)

    return _f(a_col, b_col)


def point_z(x: float, y: float, z: float, m: float | None = None) -> W.Geometry:
    """Constructor for an XYZ(/M) point (ST_PointZ analog)."""
    if m is None:
        return W.Geometry(W.POINT, np.array([[x, y, z]], dtype=np.float64), True, False)
    return W.Geometry(
        W.POINT, np.array([[x, y, z, m]], dtype=np.float64), True, True
    )


def st_point_z(x: Column, y: Column, z: Column) -> Column:
    @F.pandas_udf(BinaryType())
    def _f(xs: pd.Series, ys: pd.Series, zs: pd.Series) -> pd.Series:
        return pd.Series(
            [W.dumps(point_z(float(a), float(b), float(c))) for a, b, c in zip(xs, ys, zs)]
        )

    return _f(x.cast("double"), y.cast("double"), z.cast("double"))
