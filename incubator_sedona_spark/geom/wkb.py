"""Pure-numpy WKB (well-known binary) geometry serde.

Plays the role of the reference's geometry serializer
(/root/reference/common/src/main/java/org/apache/sedona/common/geometrySerde/GeometrySerializer.java:70-101
and its pure-python mirror
/root/reference/python/sedona/utils/geometry_serde_general.py:172,200) — except we
use standard ISO WKB so any external tool (DuckDB, shapely, PostGIS) can read our
geometry columns, and the vectorized point path never leaves numpy.

Supported types: Point, LineString, Polygon (with holes), MultiPoint,
MultiLineString, MultiPolygon, GeometryCollection — little-endian out,
either endianness in.

Z/M coordinates (reference: GeometrySerializer.java:87-101 handles XY/XYZ/XYM/
XYZM) are parsed from both ISO (+1000/2000/3000 type offsets) and EWKB
(0x80000000/0x40000000 flag) forms, carried through the Geometry model as
extra coordinate columns, and re-emitted as ISO codes.  All planar kernels
(predicates, overlay, distance) operate on the XY columns only — matching
JTS, whose predicates are 2-D — and geometry CONSTRUCTED by overlay/clip is
2-D (JTS likewise does not interpolate Z through overlays).
"""

from __future__ import annotations

import struct

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

_TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}


class Geometry:
    """Lightweight parsed geometry.

    - Point / LineString: ``parts`` is an ``(k, 2+e)`` float64 ndarray where
      ``e`` extra columns hold Z and/or M values.
    - Polygon: ``parts`` is a list of ring ndarrays (first = exterior shell,
      rest = holes); rings are closed (first == last vertex).
    - Multi* / GeometryCollection: ``parts`` is a list of child Geometry.
    """

    __slots__ = ("kind", "parts", "_bounds", "has_z", "has_m", "srid")

    def __init__(
        self,
        kind: int,
        parts,
        has_z: bool = False,
        has_m: bool = False,
        srid: int = 0,
    ):
        self.kind = kind
        self.parts = parts
        self._bounds = None
        self.has_z = has_z
        self.has_m = has_m
        # 0 = unset; nonzero SRIDs round-trip through the EWKB header flag
        # (GeometrySerializer preamble hasSrid parity, Constructors.java)
        self.srid = srid

    @property
    def ndims(self) -> int:
        return 2 + int(self.has_z) + int(self.has_m)

    def z_values(self) -> np.ndarray:
        """All Z values (empty when the geometry has no Z)."""
        if not self.has_z:
            return np.empty(0)
        arrs = []
        for leaf in self.leaves():
            rings = leaf.parts if leaf.kind == POLYGON else [leaf.parts]
            arrs.extend(r[:, 2] for r in rings)
        return np.concatenate(arrs) if arrs else np.empty(0)

    # -- structure helpers -------------------------------------------------
    def leaves(self):
        """Yield non-collection leaf geometries (self if already a leaf)."""
        if self.kind in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            for p in self.parts:
                yield from p.leaves()
        else:
            yield self

    def vertices(self) -> np.ndarray:
        """All XY coordinates as an (n, 2) array (Z/M columns excluded, so
        every planar consumer is unaffected by higher-dim inputs)."""
        arrs = []
        for leaf in self.leaves():
            if leaf.kind == POLYGON:
                arrs.extend(r[:, :2] for r in leaf.parts)
            else:
                arrs.append(leaf.parts[:, :2])
        if not arrs:
            return np.empty((0, 2))
        return np.concatenate(arrs, axis=0)

    def edges(self) -> np.ndarray:
        """All line segments as an (e, 4) array of (x1, y1, x2, y2).

        Points contribute no edges.
        """
        segs = []
        for leaf in self.leaves():
            if leaf.kind == POINT:
                continue
            rings = leaf.parts if leaf.kind == POLYGON else [leaf.parts]
            for r in rings:
                if len(r) >= 2:
                    segs.append(np.concatenate([r[:-1, :2], r[1:, :2]], axis=1))
        if not segs:
            return np.empty((0, 4))
        return np.concatenate(segs, axis=0)

    @property
    def bounds(self):
        if self._bounds is None:
            v = self.vertices()
            if len(v) == 0:
                self._bounds = (np.nan, np.nan, np.nan, np.nan)
            else:
                self._bounds = (
                    float(v[:, 0].min()),
                    float(v[:, 1].min()),
                    float(v[:, 0].max()),
                    float(v[:, 1].max()),
                )
        return self._bounds

    @property
    def is_point(self) -> bool:
        return self.kind == POINT

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Geometry {_TYPE_NAMES[self.kind]} bounds={self.bounds}>"


# -- constructors ----------------------------------------------------------

def point(x: float, y: float) -> Geometry:
    return Geometry(POINT, np.array([[x, y]], dtype=np.float64))


def linestring(coords) -> Geometry:
    return Geometry(LINESTRING, np.asarray(coords, dtype=np.float64).reshape(-1, 2))


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) == 0 or np.array_equal(ring[0], ring[-1]):
        return ring
    return np.concatenate([ring, ring[:1]], axis=0)


def polygon(shell, holes=()) -> Geometry:
    rings = [_close_ring(np.asarray(shell, dtype=np.float64).reshape(-1, 2))]
    for h in holes:
        rings.append(_close_ring(np.asarray(h, dtype=np.float64).reshape(-1, 2)))
    return Geometry(POLYGON, rings)


def box(minx: float, miny: float, maxx: float, maxy: float) -> Geometry:
    return polygon([(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)])


def multi(kind: int, children) -> Geometry:
    children = list(children)
    return Geometry(
        kind,
        children,
        any(c.has_z for c in children),
        any(c.has_m for c in children),
    )


# -- WKB encode ------------------------------------------------------------

def dumps(g: Geometry) -> bytes:
    out = bytearray()
    _write(g, out)
    return bytes(out)


def _write(g: Geometry, out: bytearray) -> None:
    out += b"\x01"  # little-endian
    # ISO WKB dimensionality offsets: Z=+1000, M=+2000, ZM=+3000;
    # a nonzero SRID is written as the EWKB 0x20000000 flag + 4-byte payload
    code = g.kind + (1000 if g.has_z else 0) + (2000 if g.has_m else 0)
    if g.srid:
        out += struct.pack("<I", code | 0x20000000)
        out += struct.pack("<I", g.srid)
        code = None
    else:
        out += struct.pack("<I", code)
    w = g.ndims
    if g.kind == POINT:
        out += np.ascontiguousarray(g.parts[0, :w], dtype="<f8").tobytes()
    elif g.kind == LINESTRING:
        out += struct.pack("<I", len(g.parts))
        out += np.ascontiguousarray(g.parts[:, :w], dtype="<f8").tobytes()
    elif g.kind == POLYGON:
        out += struct.pack("<I", len(g.parts))
        for ring in g.parts:
            out += struct.pack("<I", len(ring))
            out += np.ascontiguousarray(ring[:, :w], dtype="<f8").tobytes()
    else:
        out += struct.pack("<I", len(g.parts))
        for child in g.parts:
            _write(child, out)


# -- WKB decode ------------------------------------------------------------

def loads(buf: bytes) -> Geometry:
    g, _ = _read(memoryview(buf), 0)
    return g


def _read(mv: memoryview, off: int):
    little = mv[off] == 1
    fmt = "<" if little else ">"
    raw = struct.unpack_from(fmt + "I", mv, off + 1)[0]
    off += 5
    # EWKB (PostGIS) flag bits: 0x20000000 = embedded SRID (4-byte payload we
    # must skip), 0x80000000 = Z, 0x40000000 = M.  ISO WKB encodes Z/M/ZM as
    # type + 1000/2000/3000.  Both forms decode; Z/M columns are carried
    # through the model (GeometrySerializer.java:87-101 parity).
    srid = 0
    if raw & 0x20000000:
        srid = struct.unpack_from(fmt + "I", mv, off)[0]
        off += 4
    has_z = bool(raw & 0x80000000)
    has_m = bool(raw & 0x40000000)
    t = raw & 0x1FFFFFFF
    if t >= 1000:
        dim_code, t = divmod(t, 1000)
        has_z = has_z or dim_code in (1, 3)
        has_m = has_m or dim_code in (2, 3)
    kind = t
    w = 2 + int(has_z) + int(has_m)
    step = 8 * w
    if kind == POINT:
        coords = np.frombuffer(mv, dtype=fmt + "f8", count=w, offset=off)
        return (
            Geometry(POINT, coords.reshape(1, w).astype(np.float64), has_z, has_m, srid),
            off + step,
        )
    if kind == LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        coords = np.frombuffer(mv, dtype=fmt + "f8", count=w * n, offset=off)
        return (
            Geometry(LINESTRING, coords.reshape(n, w).astype(np.float64), has_z, has_m, srid),
            off + step * n,
        )
    if kind == POLYGON:
        (nr,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", mv, off)
            off += 4
            coords = np.frombuffer(mv, dtype=fmt + "f8", count=w * n, offset=off)
            rings.append(coords.reshape(n, w).astype(np.float64))
            off += step * n
        return Geometry(POLYGON, rings, has_z, has_m, srid), off
    if kind in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        (n,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        children = []
        for _ in range(n):
            child, off = _read(mv, off)
            children.append(child)
        cz = any(c.has_z for c in children)
        cm = any(c.has_m for c in children)
        return Geometry(kind, children, has_z or cz, has_m or cm, srid), off
    raise ValueError(f"unsupported WKB type {kind}")


def bounds(buf: bytes):
    return loads(buf).bounds


# -- vectorized batch paths (the hot paths) --------------------------------

_POINT_DTYPE = np.dtype(
    [("bo", "u1"), ("typ", "<u4"), ("x", "<f8"), ("y", "<f8")], align=False
)


def points_to_wkb(x: np.ndarray, y: np.ndarray) -> list[bytes]:
    """Vectorized point -> WKB; builds all 21-byte buffers in one numpy pass."""
    n = len(x)
    rec = np.zeros(n, dtype=_POINT_DTYPE)
    rec["bo"] = 1
    rec["typ"] = POINT
    rec["x"] = x
    rec["y"] = y
    raw = rec.tobytes()
    return [raw[i * 21 : (i + 1) * 21] for i in range(n)]


def wkb_to_points(bufs) -> np.ndarray:
    """Vectorized WKB point batch -> (n, 2) coords.

    Fast path when every buffer is a 21-byte little-endian point; otherwise
    falls back to the generic parser per row.
    """
    bufs = list(bufs)
    n = len(bufs)
    if n == 0:
        return np.empty((0, 2))
    if all(len(b) == 21 and b[0] == 1 for b in bufs):
        raw = b"".join(bufs)
        rec = np.frombuffer(raw, dtype=_POINT_DTYPE)
        return np.column_stack([rec["x"], rec["y"]]).astype(np.float64)
    out = np.empty((n, 2))
    for i, b in enumerate(bufs):
        out[i] = loads(b).vertices()[0]
    return out


def bounds_batch(bufs) -> np.ndarray:
    """WKB batch -> (n, 4) array of (xmin, ymin, xmax, ymax)."""
    bufs = list(bufs)
    n = len(bufs)
    out = np.empty((n, 4))
    if n == 0:
        return out
    if all(len(b) == 21 and b[0] == 1 for b in bufs):
        pts = wkb_to_points(bufs)
        out[:, 0] = pts[:, 0]
        out[:, 1] = pts[:, 1]
        out[:, 2] = pts[:, 0]
        out[:, 3] = pts[:, 1]
        return out
    cache: dict[bytes, tuple] = {}
    for i, b in enumerate(bufs):
        bb = cache.get(b)
        if bb is None:
            bb = loads(b).bounds
            cache[b] = bb
        out[i] = bb
    return out
