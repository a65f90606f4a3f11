"""Shapefile reader: spec-assembled fixtures (writer lives here, independent
of the reader code) + one fully hand-built byte golden.

Parity targets: PolygonParser.java ring grouping, PolyLineParser.java part
rules, ShapeType.java supported set, DbfParseUtil.java attribute carry.
"""

import struct

import numpy as np
import pytest

from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.sources.shapefile import (
    parse_dbf,
    parse_shp,
    parse_shx_count,
    read_shapefile,
)


# -- fixture writers (assembled from the ESRI spec, not via the reader) ------

def _shp_header(shape_type: int, total_len: int) -> bytes:
    h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_len // 2)
    h += struct.pack("<ii", 1000, shape_type)
    h += struct.pack("<4d", 0.0, 0.0, 100.0, 100.0)
    h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
    assert len(h) == 100
    return h


def _shp_bytes(shape_type: int, contents: list[bytes]) -> bytes:
    records = b""
    for i, c in enumerate(contents, 1):
        records += struct.pack(">ii", i, len(c) // 2) + c
    return _shp_header(shape_type, 100 + len(records)) + records


def _pt(x, y):
    return struct.pack("<idd", 1, x, y)


def _null():
    return struct.pack("<i", 0)


def _multipoint(pts):
    c = struct.pack("<i4di", 8, 0.0, 0.0, 100.0, 100.0, len(pts))
    for x, y in pts:
        c += struct.pack("<dd", x, y)
    return c


def _poly(stype: int, parts: list[list[tuple]]) -> bytes:
    n_pts = sum(len(p) for p in parts)
    c = struct.pack("<i4dii", stype, 0.0, 0.0, 100.0, 100.0, len(parts), n_pts)
    off = 0
    for p in parts:
        c += struct.pack("<i", off)
        off += len(p)
    for p in parts:
        for x, y in p:
            c += struct.pack("<dd", x, y)
    return c


def _shx_bytes(n_records: int) -> bytes:
    h = _shp_header(1, 100 + 8 * n_records)
    body = b"".join(struct.pack(">ii", 50, 10) for _ in range(n_records))
    return h + body


def _dbf_bytes(fields, rows) -> bytes:
    hdr = bytearray(32)
    hdr[0] = 3
    struct.pack_into(
        "<iHH", hdr, 4, len(rows), 32 + 32 * len(fields) + 1,
        1 + sum(l for _, _, l, _ in fields),
    )
    out = bytes(hdr)
    for name, t, l, dec in fields:
        d = bytearray(32)
        d[0:11] = name.encode("ascii").ljust(11, b"\x00")
        d[11] = ord(t)
        d[16] = l
        d[17] = dec
        out += bytes(d)
    out += b"\x0d"
    for row in rows:
        out += b" "
        for (name, t, l, dec), v in zip(fields, row):
            out += str(v).encode("latin-1").ljust(l)[:l]
    return out + b"\x1a"


CW_SQ = [(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)]          # clockwise shell
CCW_HOLE = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]        # counter-clockwise hole
CW_SQ2 = [(10, 10), (10, 12), (12, 12), (12, 10), (10, 10)]


def _write_triple(tmp_path, name, shp, dbf=None, shx=None):
    (tmp_path / f"{name}.shp").write_bytes(shp)
    if dbf is not None:
        (tmp_path / f"{name}.dbf").write_bytes(dbf)
    if shx is not None:
        (tmp_path / f"{name}.shx").write_bytes(shx)
    return str(tmp_path / f"{name}.shp")


# -- pure-parser tests --------------------------------------------------------

def test_hand_assembled_point_golden():
    # Fully literal bytes: header + one record: POINT (3.5, -2.25)
    content = struct.pack("<idd", 1, 3.5, -2.25)
    buf = _shp_header(1, 100 + 8 + len(content))
    buf += struct.pack(">ii", 1, len(content) // 2) + content
    geoms = parse_shp(buf)
    assert len(geoms) == 1
    g = geoms[0]
    assert g.kind == W.POINT
    assert tuple(g.vertices()[0]) == (3.5, -2.25)


def test_polygon_ring_grouping_matches_reference():
    # CW shell + CCW hole + second CW shell -> MultiPolygon of 2,
    # first with the hole (PolygonParser grouping).
    buf = _shp_bytes(5, [_poly(5, [CW_SQ, CCW_HOLE, CW_SQ2])])
    (g,) = parse_shp(buf)
    assert g.kind == W.MULTIPOLYGON
    assert len(g.parts) == 2
    p1, p2 = g.parts
    assert len(p1.parts) == 2  # shell + hole
    assert len(p2.parts) == 1


def test_polygon_first_ring_ccw_files_still_group():
    # Sloppy file: shells CCW — opposite-of-first is still the hole.
    ccw_shell = list(reversed(CW_SQ))
    cw_hole = list(reversed(CCW_HOLE))
    buf = _shp_bytes(5, [_poly(5, [ccw_shell, cw_hole])])
    (g,) = parse_shp(buf)
    assert g.kind == W.POLYGON
    assert len(g.parts) == 2


def test_degenerate_ring_dropped():
    # 3-coordinate "ring" is abandoned (reference: csRing.size() <= 3).
    buf = _shp_bytes(5, [_poly(5, [CW_SQ, [(5, 5), (6, 6), (5, 5)]])])
    (g,) = parse_shp(buf)
    assert g.kind == W.POLYGON
    assert len(g.parts) == 1


def test_polyline_part_rules():
    one = _poly(3, [[(0, 0), (1, 1), (2, 0)]])
    two = _poly(3, [[(0, 0), (1, 1)], [(5, 5), (6, 6), (7, 7)]])
    g1, g2 = parse_shp(_shp_bytes(3, [one, two]))
    assert g1.kind == W.LINESTRING
    assert g2.kind == W.MULTILINESTRING
    assert len(g2.parts) == 2
    assert len(g2.parts[1].vertices()) == 3


def test_multipoint_and_null():
    buf = _shp_bytes(8, [_multipoint([(1, 2), (3, 4)]), _null()])
    g, n = parse_shp(buf)
    assert g.kind == W.MULTIPOINT and len(g.parts) == 2
    assert n is None


def test_unsupported_type_raises():
    content = struct.pack("<iddd", 11, 1.0, 2.0, 3.0)  # POINTZ
    buf = _shp_header(11, 100 + 8 + len(content))
    buf += struct.pack(">ii", 1, len(content) // 2) + content
    with pytest.raises(NotImplementedError, match="POINTZ"):
        parse_shp(buf)


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        parse_shp(b"\x00" * 100)


def test_dbf_typed_decode():
    fields = [("NAME", "C", 8, 0), ("POP", "N", 10, 0),
              ("RATE", "N", 8, 3), ("OK", "L", 1, 0), ("DAY", "D", 8, 0)]
    rows = [("alpha", "1234", "0.500", "Y", "20240131"),
            ("beta", "", "", "?", "")]
    _, cols = parse_dbf(_dbf_bytes(fields, rows))
    assert cols["NAME"] == ["alpha", "beta"]
    assert cols["POP"] == [1234, None]
    assert cols["RATE"] == [0.5, None]
    assert cols["OK"] == [True, None]
    assert cols["DAY"] == ["20240131", ""]
    _, s = parse_dbf(_dbf_bytes(fields, rows), all_strings=True)
    assert s["POP"] == ["1234", ""]


def test_dbf_deleted_record_raises():
    fields = [("A", "C", 3, 0)]
    buf = bytearray(_dbf_bytes(fields, [("x",), ("y",)]))
    # flip record 2's deletion flag
    hdr_size = 32 + 32 * len(fields) + 1
    buf[hdr_size + 4] = 0x2A
    with pytest.raises(ValueError, match="deleted"):
        parse_dbf(bytes(buf))


def test_shx_count():
    assert parse_shx_count(_shx_bytes(7)) == 7


# -- distributed reader tests --------------------------------------------------

def test_read_shapefile_single(spark, tmp_path):
    shp = _shp_bytes(1, [_pt(1, 2), _null(), _pt(3, 4)])
    dbf = _dbf_bytes([("NAME", "C", 6, 0), ("POP", "N", 8, 0)],
                     [("a", "10"), ("b", "20"), ("c", "30")])
    path = _write_triple(tmp_path, "pts", shp, dbf, _shx_bytes(3))
    df = read_shapefile(spark, path)
    rows = {r.NAME: r for r in df.collect()}
    assert set(rows) == {"a", "c"}  # null shape dropped
    assert rows["a"].POP == 10
    g = W.loads(bytes(rows["c"].wkb))
    assert tuple(g.vertices()[0]) == (3.0, 4.0)

    kept = read_shapefile(spark, path, keep_null=True).collect()
    assert len(kept) == 3
    assert sum(1 for r in kept if r.wkb is None) == 1


def test_read_shapefile_directory_merges(spark, tmp_path):
    fields = [("NAME", "C", 6, 0)]
    _write_triple(tmp_path, "one", _shp_bytes(1, [_pt(0, 0)]),
                  _dbf_bytes(fields, [("x",)]))
    _write_triple(tmp_path, "two", _shp_bytes(1, [_pt(1, 1)]),
                  _dbf_bytes(fields, [("y",)]))
    df = read_shapefile(spark, str(tmp_path))
    assert {r.NAME for r in df.collect()} == {"x", "y"}
    assert df.columns == ["NAME", "wkb"]


def test_read_shapefile_schema_mismatch_raises(spark, tmp_path):
    _write_triple(tmp_path, "one", _shp_bytes(1, [_pt(0, 0)]),
                  _dbf_bytes([("NAME", "C", 6, 0)], [("x",)]))
    _write_triple(tmp_path, "two", _shp_bytes(1, [_pt(1, 1)]),
                  _dbf_bytes([("OTHER", "C", 4, 0)], [("y",)]))
    with pytest.raises(Exception, match="differs from the directory schema"):
        read_shapefile(spark, str(tmp_path)).collect()


def test_read_shapefile_shx_mismatch_raises(spark, tmp_path):
    path = _write_triple(tmp_path, "bad", _shp_bytes(1, [_pt(0, 0)]),
                         _dbf_bytes([("NAME", "C", 6, 0)], [("x",)]),
                         _shx_bytes(5))
    with pytest.raises(Exception, match="declares 5 records"):
        read_shapefile(spark, path).collect()


def test_read_shapefile_polygon_roundtrip_area(spark, tmp_path):
    from incubator_sedona_spark.functions.st import st_area
    import pyspark.sql.functions as F

    shp = _shp_bytes(5, [_poly(5, [CW_SQ, CCW_HOLE])])
    path = _write_triple(tmp_path, "poly", shp,
                         _dbf_bytes([("NAME", "C", 4, 0)], [("p1",)]))
    df = read_shapefile(spark, path)
    area = df.select(st_area(F.col("wkb")).alias("a")).collect()[0].a
    assert area == pytest.approx(16.0 - 1.0)
