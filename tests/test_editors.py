"""§2.7 long-tail editors: affine, reverse, point-on-surface, line ops."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.functions import editors as E
from incubator_sedona_spark.geom import kernel as K
from incubator_sedona_spark.geom import wkb as W


def _line(*pts):
    return W.Geometry(W.LINESTRING, np.array(pts, dtype=np.float64))


def test_affine_and_reverse(spark):
    df = spark.createDataFrame([(bytearray(W.dumps(_line((0, 0), (1, 0)))),)], "wkb binary")
    # rotate 90 deg CCW: (x,y) -> (-y, x), then translate (10, 20)
    row = df.select(E.st_affine(F.col("wkb"), 0, -1, 1, 0, 10, 20).alias("t")).first()
    g = W.loads(bytes(row.t))
    assert g.parts.tolist() == [[10.0, 20.0], [10.0, 21.0]]
    row = df.select(E.st_reverse(F.col("wkb")).alias("r")).first()
    assert W.loads(bytes(row.r)).parts.tolist() == [[1.0, 0.0], [0.0, 0.0]]


def test_point_on_surface_concave_and_holed():
    # U-shape: bbox center is OUTSIDE; the point must land inside the shape
    U = W.Geometry(
        W.POLYGON,
        [np.array([(0, 0), (10, 0), (10, 10), (8, 10), (8, 2), (2, 2), (2, 10), (0, 10), (0, 0)], dtype=float)],
    )
    p = E.point_on_surface(U)
    assert K.predicate_pair("intersects", U, p)
    donut = W.Geometry(
        W.POLYGON,
        [
            np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], dtype=float),
            np.array([(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)], dtype=float),
        ],
    )
    p = E.point_on_surface(donut)
    assert K.predicate_pair("intersects", donut, p)


def test_line_interpolate_and_substring():
    l = _line((0, 0), (10, 0), (10, 10))
    p = E.line_interpolate_point(l, 0.25)
    assert p.parts[0].tolist() == [5.0, 0.0]
    p = E.line_interpolate_point(l, 0.75)
    assert p.parts[0].tolist() == [10.0, 5.0]
    sub = E.line_substring(l, 0.25, 0.75)
    assert sub.parts.tolist() == [[5.0, 0.0], [10.0, 0.0], [10.0, 5.0]]


def test_add_remove_set_point(spark):
    df = spark.createDataFrame([(bytearray(W.dumps(_line((0, 0), (2, 2)))),)], "wkb binary")
    added = df.select(E.st_add_point(F.col("wkb"), 1.0, 1.0, 1).alias("g")).first()
    assert W.loads(bytes(added.g)).parts.tolist() == [[0, 0], [1, 1], [2, 2]]
    removed = df.select(
        E.st_remove_point(E.st_add_point(F.col("wkb"), 1.0, 1.0, 1), 0).alias("g")
    ).first()
    assert W.loads(bytes(removed.g)).parts.tolist() == [[1, 1], [2, 2]]
    setp = df.select(E.st_set_point(F.col("wkb"), 0, 5.0, 5.0).alias("g")).first()
    assert W.loads(bytes(setp.g)).parts.tolist() == [[5, 5], [2, 2]]


def test_line_merge_chains_and_junctions():
    # a-b-c chain merges; the 3-way junction at d stays split
    ml = W.multi(
        W.MULTILINESTRING,
        [_line((0, 0), (1, 0)), _line((1, 0), (2, 0)), _line((2, 0), (3, 0))],
    )
    m = E.line_merge(ml)
    assert m.kind == W.LINESTRING
    assert m.parts.tolist() == [[0, 0], [1, 0], [2, 0], [3, 0]]
    # reversed middle segment still merges
    ml2 = W.multi(W.MULTILINESTRING, [_line((0, 0), (1, 0)), _line((2, 0), (1, 0))])
    m2 = E.line_merge(ml2)
    assert m2.kind == W.LINESTRING and len(m2.parts) == 3
    star = W.multi(
        W.MULTILINESTRING,
        [_line((0, 0), (1, 1)), _line((2, 0), (1, 1)), _line((1, 2), (1, 1))],
    )
    s = E.line_merge(star)
    assert s.kind == W.MULTILINESTRING and len(s.parts) == 3


def test_multi_and_collection_extract(spark):
    gc = W.multi(
        W.GEOMETRYCOLLECTION,
        [W.point(1, 1), _line((0, 0), (1, 0)), W.loads(W.dumps(W.box(0, 0, 2, 2)))],
    )
    df = spark.createDataFrame([(bytearray(W.dumps(gc)),)], "wkb binary")
    pts = W.loads(bytes(df.select(E.st_collection_extract(F.col("wkb"), 1).alias("g")).first().g))
    assert pts.kind == W.MULTIPOINT and len(pts.parts) == 1
    polys = W.loads(bytes(df.select(E.st_collection_extract(F.col("wkb"), 3).alias("g")).first().g))
    assert polys.kind == W.MULTIPOLYGON and len(polys.parts) == 1
    m = W.loads(bytes(df.select(E.st_multi(F.col("wkb")).alias("g")).first().g))
    assert m.kind == W.GEOMETRYCOLLECTION  # already a collection: unchanged
    pm = spark.createDataFrame([(bytearray(W.dumps(W.point(3, 4))),)], "wkb binary")
    m2 = W.loads(bytes(pm.select(E.st_multi(F.col("wkb")).alias("g")).first().g))
    assert m2.kind == W.MULTIPOINT


def test_precision_reduce_and_normalize(spark):
    ring1 = np.array([(0.12345678, 0.0), (2.0, 0.0), (2.0, 2.0), (0.12345678, 0.0)])
    g1 = W.Geometry(W.POLYGON, [ring1])
    # same triangle, different start vertex and winding
    ring2 = np.array([(2.0, 2.0), (2.0, 0.0), (0.12345678, 0.0), (2.0, 2.0)])
    g2 = W.Geometry(W.POLYGON, [ring2])
    df = spark.createDataFrame(
        [(bytearray(W.dumps(g1)), bytearray(W.dumps(g2)))], "a binary, b binary"
    )
    row = df.select(
        E.st_normalize(F.col("a")).alias("na"), E.st_normalize(F.col("b")).alias("nb")
    ).first()
    assert bytes(row.na) == bytes(row.nb)  # canonical form is byte-equal
    red = df.select(E.st_precision_reduce(F.col("a"), 2).alias("r")).first()
    assert W.loads(bytes(red.r)).parts[0][0].tolist() == [0.12, 0.0]


def test_indexed_accessors_and_constructors(spark):
    line = _line((0, 0), (1, 1), (2, 0))
    mp = W.multi(W.MULTIPOINT, [W.point(0, 0), W.point(1, 1), W.point(2, 0)])
    donut = W.Geometry(
        W.POLYGON,
        [
            np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]),
            np.array([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]),
        ],
    )
    ring = W.Geometry(W.LINESTRING, np.array([(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 0.0)]))
    df = spark.createDataFrame(
        [(bytearray(W.dumps(line)), bytearray(W.dumps(mp)), bytearray(W.dumps(donut)), bytearray(W.dumps(ring)))],
        "l binary, mp binary, d binary, ring binary",
    )
    row = df.select(
        E.st_point_n(F.col("l"), 2).alias("p2"),
        E.st_point_n(F.col("l"), -1).alias("plast"),
        E.st_start_point(F.col("l")).alias("sp"),
        E.st_end_point(F.col("l")).alias("ep"),
        E.st_geometry_n(F.col("mp"), 1).alias("g1"),
        E.st_interior_ring_n(F.col("d"), 0).alias("ir"),
        E.st_make_polygon(F.col("ring")).alias("poly"),
        E.st_line_from_multipoint(F.col("mp")).alias("lfm"),
    ).first()
    assert W.loads(bytes(row.p2)).parts[0].tolist() == [1.0, 1.0]
    assert W.loads(bytes(row.plast)).parts[0].tolist() == [2.0, 0.0]
    assert W.loads(bytes(row.sp)).parts[0].tolist() == [0.0, 0.0]
    assert W.loads(bytes(row.ep)).parts[0].tolist() == [2.0, 0.0]
    assert W.loads(bytes(row.g1)).parts[0].tolist() == [1.0, 1.0]
    ir = W.loads(bytes(row.ir))
    assert ir.kind == W.LINESTRING and len(ir.parts) == 5
    poly = W.loads(bytes(row.poly))
    assert poly.kind == W.POLYGON
    lfm = W.loads(bytes(row.lfm))
    assert lfm.kind == W.LINESTRING and len(lfm.parts) == 3
