"""ST_ scalar function surface (DataFrame Column helpers).

Covers the subset of the reference catalog
(/root/reference/sql/common/src/main/scala/org/apache/sedona/sql/UDF/Catalog.scala:39-161)
exercised by its test strategy: constructors, accessors/measures, transforms,
output, cell-indexing and spherical distance.  Where the computation is pure
arithmetic it is expressed as native Catalyst columns (codegen, zero Python);
geometry-shape work runs through Arrow-batched pandas UDFs over WKB.

Unlike the reference — where every expression is CodegenFallback
(InferredExpression.scala:42) — the native subset here participates in
whole-stage codegen, and the UDF subset is vectorized over Arrow batches.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
)

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.geom import kernel as K
from incubator_sedona_spark.geom import wkb as W

__all__ = [
    "st_transform_4326_to_3857",
    "st_transform_3857_to_4326",
    "st_azimuth",
    "st_num_geometries",
    "st_boundary_bbox",
    "st_exterior_ring",
    "st_dump",
    "st_geometric_median",
    "st_point",
    "st_geom_from_wkt",
    "st_as_text",
    "st_polygon_from_envelope",
    "st_x",
    "st_y",
    "st_area",
    "st_length",
    "st_distance",
    "st_npoints",
    "st_geometry_type",
    "st_envelope_bbox",
    "st_centroid_xy",
    "st_is_valid",
    "st_buffer_bbox",
    "st_distance_sphere",
    "st_cell_ids",
    "st_geohash",
    "st_predicate",
    "st_translate",
    "st_flip_coordinates",
    "st_convex_hull",
    "st_simplify",
    "st_make_valid",
]


# -- constructors --------------------------------------------------------------

def st_point(x: Column, y: Column) -> Column:
    """Point WKB from coordinate columns — vectorized numpy buffer assembly."""

    @F.pandas_udf(BinaryType())
    def _mk(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(W.points_to_wkb(xs.to_numpy(np.float64), ys.to_numpy(np.float64)))

    return _mk(x.cast("double"), y.cast("double"))


def st_polygon_from_envelope(xmin, ymin, xmax, ymax) -> Column:
    @F.pandas_udf(BinaryType())
    def _mk(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        return pd.Series(
            [W.dumps(W.box(*t)) for t in zip(a, b, c, d)]
        )

    return _mk(
        F.lit(xmin) if not isinstance(xmin, Column) else xmin,
        F.lit(ymin) if not isinstance(ymin, Column) else ymin,
        F.lit(xmax) if not isinstance(xmax, Column) else xmax,
        F.lit(ymax) if not isinstance(ymax, Column) else ymax,
    )


def _parse_wkt(text: str) -> W.Geometry:
    text = text.strip()
    head, _, body = text.partition("(")
    head = head.strip().upper()
    body = "(" + body

    def coords(s):
        return [tuple(float(v) for v in p.split()[:2]) for p in s.split(",")]

    def strip1(s):
        s = s.strip()
        assert s[0] == "(" and s[-1] == ")"
        return s[1:-1]

    if head == "POINT":
        (xy,) = coords(strip1(body))
        return W.point(*xy)
    if head == "LINESTRING":
        return W.linestring(coords(strip1(body)))
    if head == "POLYGON":
        inner = strip1(body)
        rings, depth, cur = [], 0, ""
        for ch in inner:
            if ch == "(":
                depth += 1
                cur = ""
            elif ch == ")":
                depth -= 1
                rings.append(coords(cur))
            elif depth:
                cur += ch
        return W.polygon(rings[0], rings[1:])
    if head in ("MULTIPOINT",):
        inner = strip1(body).replace("(", "").replace(")", "")
        return W.multi(W.MULTIPOINT, [W.point(*xy) for xy in coords(inner)])
    if head == "MULTILINESTRING":
        inner = strip1(body)
        lines, depth, cur = [], 0, ""
        for ch in inner:
            if ch == "(":
                depth += 1
                cur = ""
            elif ch == ")":
                depth -= 1
                lines.append(W.linestring(coords(cur)))
            elif depth:
                cur += ch
        return W.multi(W.MULTILINESTRING, lines)
    if head == "GEOMETRYCOLLECTION":
        inner = strip1(body)
        parts, depth, cur = [], 0, ""
        for ch in inner:
            cur += ch
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    parts.append(_parse_wkt(cur.strip().lstrip(",").strip()))
                    cur = ""
        return W.multi(W.GEOMETRYCOLLECTION, parts)
    if head == "MULTIPOLYGON":
        inner = strip1(body)
        polys, depth, cur = [], 0, ""
        for ch in inner:
            if ch == "(":
                depth += 1
                if depth == 1:
                    cur = ""
                else:
                    cur += ch
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    polys.append(_parse_wkt("POLYGON" + ("(" + cur + ")") if not cur.startswith("(") else "POLYGON(" + cur + ")"))
                else:
                    cur += ch
            else:
                if depth >= 1:
                    cur += ch
        return W.multi(W.MULTIPOLYGON, polys)
    raise ValueError(f"unsupported WKT {head}")


def _wkt_num(x) -> str:
    # shortest exact-roundtrip decimal (JTS WKTWriter style: '5' not '5.0',
    # full precision otherwise — '%g' would truncate to 6 significant digits)
    r = repr(float(x))
    return r[:-2] if r.endswith(".0") else r


def _to_wkt(g: W.Geometry) -> str:
    def ring_s(r):
        return "(" + ", ".join(f"{_wkt_num(p[0])} {_wkt_num(p[1])}" for p in r) + ")"

    if g.kind == W.POINT:
        p = g.parts[0]
        return f"POINT ({_wkt_num(p[0])} {_wkt_num(p[1])})"
    if g.kind == W.LINESTRING:
        return "LINESTRING " + ring_s(g.parts)
    if g.kind == W.POLYGON:
        return "POLYGON (" + ", ".join(ring_s(r) for r in g.parts) + ")"
    if g.kind == W.MULTIPOLYGON:
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(ring_s(r) for r in c.parts) + ")" for c in g.parts)
            + ")"
        )
    if g.kind == W.MULTIPOINT:
        return (
            "MULTIPOINT ("
            + ", ".join(f"({_wkt_num(p[0])} {_wkt_num(p[1])})" for c in g.parts for p in c.parts)
            + ")"
        )
    if g.kind == W.MULTILINESTRING:
        return "MULTILINESTRING (" + ", ".join(ring_s(c.parts) for c in g.parts) + ")"
    if g.kind == W.GEOMETRYCOLLECTION:
        return "GEOMETRYCOLLECTION (" + ", ".join(_to_wkt(c) for c in g.parts) + ")"
    raise ValueError("unsupported for WKT output")


def st_geom_from_wkt(wkt: Column) -> Column:
    @F.pandas_udf(BinaryType())
    def _mk(s: pd.Series) -> pd.Series:
        return pd.Series([W.dumps(_parse_wkt(t)) for t in s])

    return _mk(wkt)


def st_as_text(wkb_col: Column) -> Column:
    @F.pandas_udf(StringType())
    def _mk(s: pd.Series) -> pd.Series:
        return pd.Series([_to_wkt(W.loads(b)) for b in s])

    return _mk(wkb_col)


# -- accessors / measures --------------------------------------------------------

def st_x(wkb_col: Column) -> Column:
    @F.pandas_udf(DoubleType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series(W.wkb_to_points(s)[:, 0])

    return _f(wkb_col)


def st_y(wkb_col: Column) -> Column:
    @F.pandas_udf(DoubleType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series(W.wkb_to_points(s)[:, 1])

    return _f(wkb_col)


def _shoelace(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def st_area(wkb_col: Column) -> Column:
    @F.pandas_udf(DoubleType())
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            g = W.loads(b)
            area = 0.0
            for leaf in g.leaves():
                if leaf.kind == W.POLYGON:
                    area += abs(_shoelace(leaf.parts[0]))
                    for hole in leaf.parts[1:]:
                        area -= abs(_shoelace(hole))
            out.append(area)
        return pd.Series(out)

    return _f(wkb_col)


def st_length(wkb_col: Column) -> Column:
    @F.pandas_udf(DoubleType())
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            e = W.loads(b).edges()
            out.append(float(np.hypot(e[:, 2] - e[:, 0], e[:, 3] - e[:, 1]).sum()) if len(e) else 0.0)
        return pd.Series(out)

    return _f(wkb_col)


def st_distance(a: Column, b: Column) -> Column:
    @F.pandas_udf(DoubleType())
    def _f(l: pd.Series, r: pd.Series) -> pd.Series:
        return pd.Series(K.distance_batch(l, r))

    return _f(a, b)


def st_npoints(wkb_col: Column) -> Column:
    @F.pandas_udf(IntegerType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([len(W.loads(b).vertices()) for b in s], dtype="int32")

    return _f(wkb_col)


def st_geometry_type(wkb_col: Column) -> Column:
    @F.pandas_udf(StringType())
    def _f(s: pd.Series) -> pd.Series:
        names = {
            W.POINT: "ST_Point",
            W.LINESTRING: "ST_LineString",
            W.POLYGON: "ST_Polygon",
            W.MULTIPOINT: "ST_MultiPoint",
            W.MULTILINESTRING: "ST_MultiLineString",
            W.MULTIPOLYGON: "ST_MultiPolygon",
            W.GEOMETRYCOLLECTION: "ST_GeometryCollection",
        }
        return pd.Series([names[W.loads(b).kind] for b in s])

    return _f(wkb_col)


def st_envelope_bbox(wkb_col: Column) -> Column:
    """array<double>(xmin, ymin, xmax, ymax) — the engine's envelope form."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series(list(W.bounds_batch(s)))

    return _f(wkb_col)


def st_centroid_xy(wkb_col: Column) -> Column:
    """array<double>(cx, cy): vertex-mean for points/lines, area centroid for polygons."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            g = W.loads(b)
            polys = [l for l in g.leaves() if l.kind == W.POLYGON]
            if polys:
                A = Cx = Cy = 0.0
                for p in polys:
                    # each polygon's contribution is normalized so its SHELL
                    # counts positive regardless of stored winding (WKB allows
                    # either; CW shells from shapefile-derived data must not
                    # cancel CCW shells across a MultiPolygon), and holes are
                    # forced to subtract even if stored with the shell's
                    # winding — matching JTS ST_Centroid
                    shell = p.parts[0]
                    sa = (
                        shell[:-1, 0] * shell[1:, 1] - shell[1:, 0] * shell[:-1, 1]
                    ).sum() / 2.0
                    flip = -1.0 if sa < 0 else 1.0
                    for ri, r in enumerate(p.parts):
                        x, y = r[:-1, 0], r[:-1, 1]
                        x1, y1 = r[1:, 0], r[1:, 1]
                        cross = x * y1 - x1 * y
                        a = cross.sum() / 2.0
                        if a != 0:
                            sgn = flip
                            if ri > 0 and a * sa > 0:
                                sgn = -flip
                            Cx += sgn * float(((x + x1) * cross).sum() / 6.0)
                            Cy += sgn * float(((y + y1) * cross).sum() / 6.0)
                            A += sgn * a
                out.append(np.array([Cx / A, Cy / A]) if A else g.vertices().mean(axis=0))
            else:
                out.append(g.vertices().mean(axis=0))
        return pd.Series(out)

    return _f(wkb_col)


def st_is_valid(wkb_col: Column) -> Column:
    """Polygon validity: rings closed, >=4 points, and no ring self-intersection
    (proper crossings between non-adjacent edges — the common invalidity JTS
    rejects; full OGC validity also checks ring nesting, not needed here)."""
    from incubator_sedona_spark.geom import kernel as K

    @F.pandas_udf(BooleanType())
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            g = W.loads(b)
            ok = True
            for leaf in g.leaves():
                if leaf.kind != W.POLYGON:
                    continue
                for r in leaf.parts:
                    if len(r) < 4 or not np.array_equal(r[0], r[-1]):
                        ok = False
                        break
                    edges = np.column_stack([r[:-1], r[1:]])
                    # proper (transversal) crossing between any two edges of
                    # the same ring = bowtie/self-intersection
                    if K.segments_intersect_any(edges, edges, proper_only=True):
                        ok = False
                        break
                if not ok:
                    break
            out.append(ok)
        return pd.Series(out)

    return _f(wkb_col)


# -- transforms ------------------------------------------------------------------

def st_buffer_bbox(wkb_col: Column, dist: float) -> Column:
    """Envelope-expanded box polygon (the join-planning form of ST_Buffer;
    exact round buffers are not needed by any reference test we replicate)."""

    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            x0, y0, x1, y1 = W.loads(b).bounds
            out.append(W.dumps(W.box(x0 - dist, y0 - dist, x1 + dist, y1 + dist)))
        return pd.Series(out)

    return _f(wkb_col)


def _map_coords(fn):
    def _arr(arr: np.ndarray) -> np.ndarray:
        # transform the XY columns; Z/M ride along unchanged
        xy = fn(arr[:, :2])
        if arr.shape[1] > 2:
            return np.column_stack([xy, arr[:, 2:]])
        return xy

    def apply(g: W.Geometry) -> W.Geometry:
        if g.kind in (W.POINT, W.LINESTRING):
            return W.Geometry(g.kind, _arr(g.parts), g.has_z, g.has_m)
        if g.kind == W.POLYGON:
            return W.Geometry(W.POLYGON, [_arr(r) for r in g.parts], g.has_z, g.has_m)
        return W.Geometry(g.kind, [apply(c) for c in g.parts], g.has_z, g.has_m)

    return apply


def st_translate(wkb_col: Column, dx: float, dy: float) -> Column:
    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        tr = _map_coords(lambda c: c + np.array([dx, dy]))
        return pd.Series([W.dumps(tr(W.loads(b))) for b in s])

    return _f(wkb_col)


def st_flip_coordinates(wkb_col: Column) -> Column:
    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        fl = _map_coords(lambda c: c[:, ::-1].copy())
        return pd.Series([W.dumps(fl(W.loads(b))) for b in s])

    return _f(wkb_col)


def st_convex_hull(wkb_col: Column) -> Column:
    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            pts = W.loads(b).vertices()
            hull = _convex_hull(pts)
            out.append(W.dumps(W.polygon(hull)) if len(hull) >= 3 else b)
        return pd.Series(out)

    return _f(wkb_col)


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain."""
    p = np.unique(pts, axis=0)
    p = p[np.lexsort((p[:, 1], p[:, 0]))]
    if len(p) <= 2:
        return p

    def half(points):
        h = []
        for q in points:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], q - h[-2]) <= 0:
                h.pop()
            h.append(q)
        return h

    lower, upper = half(p), half(p[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _dp_simplify(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker on an (n, 2) coordinate array (Z/M dropped)."""
    coords = np.asarray(coords, dtype=np.float64)[:, :2]
    if len(coords) <= 2:
        return coords
    keep = np.zeros(len(coords), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(coords) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = np.array([[*coords[i], *coords[j]]])
        d = K.points_to_segments_dist(coords[i + 1 : j], seg)
        kk = int(np.argmax(d))
        if d[kk] > tol:
            keep[i + 1 + kk] = True
            stack += [(i, i + 1 + kk), (i + 1 + kk, j)]
    return coords[keep]


def st_simplify(wkb_col: Column, tol: float) -> Column:
    """Douglas-Peucker per ring/line (plain ST_Simplify; see
    functions.scalars.st_simplify_preserve_topology for the validity-guarded
    form)."""

    def dp(coords: np.ndarray) -> np.ndarray:
        return _dp_simplify(coords, tol)

    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            g = W.loads(b)
            if g.kind == W.LINESTRING:
                out.append(W.dumps(W.linestring(dp(g.parts))))
            elif g.kind == W.POLYGON:
                rings = [dp(r) for r in g.parts]
                rings = [r if len(r) >= 4 else g.parts[i] for i, r in enumerate(rings)]
                out.append(W.dumps(W.Geometry(W.POLYGON, rings)))
            else:
                out.append(b)
        return pd.Series(out)

    return _f(wkb_col)


def _polygon_ring_invalid(g: W.Geometry) -> bool:
    from incubator_sedona_spark.geom import kernel as K

    for leaf in g.leaves():
        if leaf.kind != W.POLYGON:
            continue
        for r in leaf.parts:
            if len(r) < 4 or not np.array_equal(r[0], r[-1]):
                return True
            edges = np.column_stack([r[:-1, :2], r[1:, :2]])
            if K.segments_intersect_any(edges, edges, proper_only=True):
                return True
    return False


def make_valid_geometry(g: W.Geometry) -> W.Geometry:
    """JTS GeometryFixer-style polygon repair (round 3; was close-rings-only):
    node every ring edge against every other, face-trace the noded boundary
    into non-crossing loops, and rebuild even-odd shell/hole nesting — a
    bowtie becomes the MultiPolygon of its two lobes, exactly MakeValid's
    keepCollapsed=false behavior.  Valid inputs return unchanged (cheap
    self-intersection pre-check); non-polygonal geometry passes through."""
    from incubator_sedona_spark.geom import clip as C

    if not any(leaf.kind == W.POLYGON for leaf in g.leaves()):
        return g
    # close unclosed rings first (the serde-level failure), then check
    closed = (
        W.polygon(g.parts[0], g.parts[1:]) if g.kind == W.POLYGON else g
    )
    if not _polygon_ring_invalid(closed):
        return closed
    rings = C.rings_of_geometry(closed)
    E = C._edges_of_rings(rings)
    eps = C._scale_of(E) * C._REL_EPS
    params = C._split_params(E, E, eps)
    subs = C._subdivide(E, params)
    loops = C._stitch(subs, eps)
    # split pinched (figure-eight) loops at repeated vertices: JTS MakeValid
    # emits the lobes as separate polygons, not one self-touching shell
    simple = []
    for ring in loops:
        q = eps * 8.0
        pos: dict[tuple, int] = {}
        cur: list = []
        for pt in ring[:-1]:
            k = (round(pt[0] / q), round(pt[1] / q))
            if k in pos:
                j = pos[k]
                lobe = cur[j:] + [pt]
                if len(lobe) >= 4:
                    simple.append(np.asarray(lobe))
                for p2 in cur[j + 1 :]:
                    pos.pop((round(p2[0] / q), round(p2[1] / q)), None)
                cur = cur[: j + 1]
            else:
                pos[k] = len(cur)
                cur.append(pt)
        if len(cur) >= 3:
            simple.append(np.asarray(cur + [cur[0]]))
    return C.rings_to_geometry(simple, eps)


def st_make_valid(wkb_col: Column) -> Column:
    """ST_MakeValid: ring closure + self-intersection repair via noding and
    even-odd area rebuild (see make_valid_geometry)."""

    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([W.dumps(make_valid_geometry(W.loads(b))) for b in s])

    return _f(wkb_col)


# -- spherical -------------------------------------------------------------------

def st_distance_sphere(lon1, lat1, lon2, lat2, radius: float = 6371008.0) -> Column:
    """Haversine, default R=6371008 — constants per Catalog.scala:148 +
    common/.../sphere/Haversine.java.  Pure Catalyst arithmetic."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rl1) * F.cos(rl2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * radius) * F.asin(F.sqrt(a))


# -- cell indexing ----------------------------------------------------------------

def st_cell_ids(wkb_col: Column, grid: Grid) -> Column:
    """Covering cell ids for a geometry column (ST_S2CellIDs analog,
    common/.../Functions.java:572-585): per-coordinate cells for points,
    bbox covering rounded to one level for other shapes."""

    @F.pandas_udf(ArrayType(LongType()))
    def _f(s: pd.Series) -> pd.Series:
        bb = W.bounds_batch(s)
        return pd.Series(grid.cover_bbox_batch(bb))

    return _f(wkb_col)


_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def st_geohash(lon: Column, lat: Column, precision: int) -> Column:
    """Geohash of a point — vectorized numpy bit interleave
    (PointGeoHashEncoder.java analog)."""

    @F.pandas_udf(StringType())
    def _f(xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(xs, ys):
            lo, hi = (-180.0, 180.0), (-90.0, 90.0)
            bits = []
            even = True
            while len(bits) < precision * 5:
                if even:
                    mid = (lo[0] + lo[1]) / 2
                    bits.append(x >= mid)
                    lo = (mid, lo[1]) if x >= mid else (lo[0], mid)
                else:
                    mid = (hi[0] + hi[1]) / 2
                    bits.append(y >= mid)
                    hi = (mid, hi[1]) if y >= mid else (hi[0], mid)
                even = not even
            chars = []
            for i in range(precision):
                v = 0
                for b in bits[i * 5 : (i + 1) * 5]:
                    v = (v << 1) | int(b)
                chars.append(_BASE32[v])
            out.append("".join(chars))
        return pd.Series(out)

    return _f(lon.cast("double"), lat.cast("double"))


# -- predicates as column functions ------------------------------------------------

def st_predicate(name: str, a: Column, b: Column) -> Column:
    """ST_Contains/ST_Intersects/... as a boolean column (Predicates.scala:71-243)."""

    @F.pandas_udf(BooleanType())
    def _f(l: pd.Series, r: pd.Series) -> pd.Series:
        return pd.Series(K.eval_predicate_batch(name, l, r))

    return _f(a, b)


# -- CRS transform (pure-numpy Web Mercator; ST_Transform's dominant use) -------

_R_MERC = 6378137.0


def st_transform_4326_to_3857(wkb_col: Column) -> Column:
    """EPSG:4326 (lon/lat degrees) -> EPSG:3857 (Web Mercator meters).

    The tiling-relevant subset of ST_Transform (reference uses GeoTools for
    arbitrary CRS; this engine implements the spherical-Mercator pair in
    closed form — pyproj, when importable, can be slotted in the same UDF).
    """

    def fwd(c: np.ndarray) -> np.ndarray:
        x = np.radians(c[:, 0]) * _R_MERC
        y = np.log(np.tan(np.pi / 4 + np.radians(np.clip(c[:, 1], -89.9999, 89.9999)) / 2)) * _R_MERC
        return np.column_stack([x, y])

    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        tr = _map_coords(fwd)
        return pd.Series([W.dumps(tr(W.loads(b))) for b in s])

    return _f(wkb_col)


def st_transform_3857_to_4326(wkb_col: Column) -> Column:
    def inv(c: np.ndarray) -> np.ndarray:
        lon = np.degrees(c[:, 0] / _R_MERC)
        lat = np.degrees(2 * np.arctan(np.exp(c[:, 1] / _R_MERC)) - np.pi / 2)
        return np.column_stack([lon, lat])

    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        tr = _map_coords(inv)
        return pd.Series([W.dumps(tr(W.loads(b))) for b in s])

    return _f(wkb_col)


# -- more accessors ---------------------------------------------------------------

def st_azimuth(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Azimuth in radians clockwise from north (Functions.java ST_Azimuth) —
    pure Catalyst arithmetic."""
    az = F.atan2(x2 - x1, y2 - y1)
    return F.when(az < 0, az + F.lit(2 * math.pi)).otherwise(az)


def st_num_geometries(wkb_col: Column) -> Column:
    @F.pandas_udf(IntegerType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([len(list(W.loads(b).leaves())) for b in s], dtype="int32")

    return _f(wkb_col)


def boundary_geometry(g: W.Geometry) -> W.Geometry:
    """JTS Geometry.getBoundary semantics (round 3; was exterior-ring-only):
    polygon -> LineString (no holes) or MultiLineString (shell + holes),
    MultiPolygon -> MultiLineString of every ring, LineString -> MultiPoint
    endpoints (EMPTY when closed), MultiLineString -> mod-2 endpoint rule,
    points -> empty collection."""
    if g.kind == W.POLYGON:
        rings = [W.linestring(r[:, :2]) for r in g.parts]
        return rings[0] if len(rings) == 1 else W.multi(W.MULTILINESTRING, rings)
    if g.kind == W.MULTIPOLYGON:
        rings = [W.linestring(r[:, :2]) for p in g.parts for r in p.parts]
        return W.multi(W.MULTILINESTRING, rings)
    if g.kind == W.LINESTRING:
        if len(g.parts) >= 2 and np.array_equal(g.parts[0, :2], g.parts[-1, :2]):
            return W.multi(W.GEOMETRYCOLLECTION, [])  # closed: empty boundary
        return W.multi(
            W.MULTIPOINT, [W.point(*g.parts[0, :2]), W.point(*g.parts[-1, :2])]
        )
    if g.kind == W.MULTILINESTRING:
        # mod-2 rule: endpoints appearing an odd number of times
        counts: dict[tuple, int] = {}
        for line in g.parts:
            for p in (line.parts[0, :2], line.parts[-1, :2]):
                k = (float(p[0]), float(p[1]))
                counts[k] = counts.get(k, 0) + 1
        odd = [W.point(x, y) for (x, y), c in counts.items() if c % 2 == 1]
        return W.multi(W.MULTIPOINT, odd) if odd else W.multi(W.GEOMETRYCOLLECTION, [])
    return W.multi(W.GEOMETRYCOLLECTION, [])


def st_boundary(wkb_col: Column) -> Column:
    """ST_Boundary (full JTS getBoundary semantics)."""

    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([W.dumps(boundary_geometry(W.loads(b))) for b in s])

    return _f(wkb_col)


def st_centroid(wkb_col: Column) -> Column:
    """ST_Centroid as a POINT geometry (st_centroid_xy gives the raw pair)."""
    xy = st_centroid_xy(wkb_col)
    return st_point(F.element_at(xy, 1), F.element_at(xy, 2))


def st_envelope(wkb_col: Column) -> Column:
    """ST_Envelope as a polygon geometry (st_envelope_bbox gives the array)."""
    bb = st_envelope_bbox(wkb_col)
    return st_polygon_from_envelope(
        F.element_at(bb, 1), F.element_at(bb, 2), F.element_at(bb, 3), F.element_at(bb, 4)
    )


def st_boundary_bbox(wkb_col: Column) -> Column:
    """Boundary ring of polygons as a LineString (exterior ring); lines ->
    endpoints MultiPoint; points -> empty collection.  Kept for callers that
    want the exterior-only fast form; st_boundary is the full-semantics one."""

    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            g = W.loads(b)
            if g.kind == W.POLYGON:
                out.append(W.dumps(W.linestring(g.parts[0])))
            elif g.kind == W.LINESTRING:
                out.append(
                    W.dumps(
                        W.multi(W.MULTIPOINT, [W.point(*g.parts[0]), W.point(*g.parts[-1])])
                    )
                )
            else:
                out.append(W.dumps(W.multi(W.GEOMETRYCOLLECTION, [])))
        return pd.Series(out)

    return _f(wkb_col)


def st_exterior_ring(wkb_col: Column) -> Column:
    @F.pandas_udf(BinaryType())
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            g = W.loads(b)
            out.append(W.dumps(W.linestring(g.parts[0])) if g.kind == W.POLYGON else None)
        return pd.Series(out)

    return _f(wkb_col)


def st_dump(wkb_col: Column) -> Column:
    """array<binary> of leaf geometries — explode() replaces the reference's
    generator expression (ST_SubDivideExplode/ST_Dump pattern)."""

    @F.pandas_udf(ArrayType(BinaryType()))
    def _f(s: pd.Series) -> pd.Series:
        return pd.Series([[W.dumps(leaf) for leaf in W.loads(b).leaves()] for b in s])

    return _f(wkb_col)


def st_geometric_median(wkb_col: Column, tol: float = 1e-6, max_iter: int = 1000) -> Column:
    """Weiszfeld iteration over a MultiPoint (Catalog.scala:147 constants:
    tol 1e-6, 1000 iterations)."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def _f(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            pts = W.loads(b).vertices()
            m = pts.mean(axis=0)
            for _ in range(max_iter):
                d = np.hypot(pts[:, 0] - m[0], pts[:, 1] - m[1])
                if np.any(d < 1e-12):
                    break
                wgt = 1.0 / d
                nm = (pts * wgt[:, None]).sum(axis=0) / wgt.sum()
                if np.hypot(*(nm - m)) < tol:
                    m = nm
                    break
                m = nm
            out.append(m)
        return pd.Series(out)

    return _f(wkb_col)
