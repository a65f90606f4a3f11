"""Regression tests for the round-4 ADVICE items fixed in round 5.

1. jpeg.py — 4-component (CMYK/YCCK) baseline streams and Adobe APP14
   transform=0 RGB streams must fail loud, not decode with wrong colors.
2. knn.py — right_geom mode no longer derives a synthetic row id at all:
   the owner-cell rule dedups multi-cell candidates with a pure filter
   (no per-round dropDuplicates shuffle, nothing plan-nondeterministic to
   stabilize).  Correctness via the existing brute-force-equality tests;
   the no-extra-Exchange property asserted here.
3. partitioning.salt_cells — probe-side salt hashes a configurable key
   subset; MapType columns no longer break analysis by default.
4. pipeline.components — misspelled id columns raise a descriptive
   ValueError, not a bare KeyError.
5. pipeline.dedup — a driver that cannot LIST the scratch dir degrades to
   a warning (executor-side load stays the authoritative gate).
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.sources.jpeg import decode_jpeg


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _sof0(nc: int) -> bytes:
    body = struct.pack(">BHHB", 8, 16, 16, nc)
    for c in range(nc):
        body += bytes([c + 1, 0x11, 0])
    return _seg(0xC0, body)


def _sos(nc: int) -> bytes:
    body = bytes([nc])
    for c in range(nc):
        body += bytes([c + 1, 0x00])
    body += bytes([0, 63, 0])
    return _seg(0xDA, body)


def test_jpeg_cmyk_four_components_raises():
    # Adobe CMYK/YCCK: previously comps_px[0..2] were treated as YCbCr and
    # the K channel silently dropped -> wrong colors with no error
    buf = b"\xff\xd8" + _sof0(4) + _sos(4) + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="4 components"):
        decode_jpeg(buf)


def test_jpeg_app14_transform0_rgb_raises():
    # APP14 transform=0 marks 3 components as literal RGB; running the
    # YCbCr conversion on them corrupts every pixel
    app14 = _seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    buf = b"\xff\xd8" + app14 + _sof0(3) + _sos(3) + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="transform=0"):
        decode_jpeg(buf)


def test_jpeg_app14_transform1_still_decodes(spark):
    # APP14 transform=1 (YCbCr) must NOT trip the new guard — round-trip a
    # real JVM-encoded JPEG with an Adobe transform=1 segment spliced in
    from tests.test_jpeg_codec import _jvm_jpeg_roundtrip, _smooth

    pix = _smooth(24, 24, seed=5)
    jpg, ref = _jvm_jpeg_roundtrip(spark, pix)
    app14 = _seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 1]))
    spliced = jpg[:2] + app14 + jpg[2:]
    out = decode_jpeg(spliced)
    assert out.shape == ref.shape


def test_knn_join_geometry_mode_no_dedup_shuffle(spark):
    """right_geom candidates dedup via the owner-cell filter: the plan must
    contain no Deduplicate operator (a per-round exchange at scale) and no
    synthetic __rid column."""
    from incubator_sedona_spark.cells import Grid
    from incubator_sedona_spark.functions.st import st_polygon_from_envelope
    from incubator_sedona_spark.operators.knn import knn_join

    pts = spark.range(40).select(
        F.col("id").alias("pid"),
        (F.pmod(F.col("id") * 37, 100) / 1.0).alias("x"),
        (F.pmod(F.col("id") * 61, 100) / 1.0).alias("y"),
    )
    polys = spark.range(12).select(
        F.col("id").alias("gid"),
        st_polygon_from_envelope(
            F.pmod(F.col("id") * 17, 80) / 1.0,
            F.pmod(F.col("id") * 29, 80) / 1.0,
            F.pmod(F.col("id") * 17, 80) / 1.0 + 15.0,
            F.pmod(F.col("id") * 29, 80) / 1.0 + 15.0,
        ).alias("wkb"),
    )
    grid = Grid(0.0, 0.0, 100.01, 100.01, 3)
    out = knn_join(pts, polys, k=3, grid=grid, left_id="pid", right_geom="wkb")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in plan
    assert "__rid" not in plan
    assert out.count() == 40 * 3
    # each (pid, gid) pair at most once — the owner-cell rule really dedups
    assert out.groupBy("pid", "gid").count().where(F.col("count") > 1).count() == 0


def test_knn_join_auto_grid_matches_explicit(spark):
    """grid=None sizes the cell level from right-side density; results must
    be identical to any explicit grid (the index never changes answers)."""
    from incubator_sedona_spark.cells import Grid
    from incubator_sedona_spark.operators.knn import knn_join

    pts = spark.range(60).select(
        F.col("id").alias("pid"),
        (F.pmod(F.col("id") * 37, 97) / 1.0).alias("x"),
        (F.pmod(F.col("id") * 61, 97) / 1.0).alias("y"),
    )
    rs = spark.range(500).select(
        F.col("id").alias("rid"),
        (F.pmod(F.col("id") * 13, 101) / 1.01).alias("x"),
        (F.pmod(F.col("id") * 7, 103) / 1.03).alias("y"),
    )
    a = knn_join(pts, rs, 4, None, left_id="pid", tiebreak="rid").select(
        "pid", "rid", "knn_rank"
    )
    b = knn_join(
        pts, rs, 4, Grid(0.0, 0.0, 100.01, 100.01, 5), left_id="pid", tiebreak="rid"
    ).select("pid", "rid", "knn_rank")
    assert a.count() == 240
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # empty right side: auto grid must not crash on null bounds
    empty = rs.where(F.lit(False))
    assert knn_join(pts, empty, 3, None, left_id="pid").count() == 0


def test_salt_cells_map_column_does_not_break_analysis(spark):
    from incubator_sedona_spark.partitioning import salt_cells

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).alias("cell"),
        F.create_map(F.lit("k"), F.col("id").cast("string")).alias("meta"),
    )
    salted = salt_cells(df, {0: 999}, factor=4)
    rows = salted.groupBy("salt").count().collect()
    assert len(rows) > 1  # hot cell 0 actually spread over sub-keys


def test_salt_cells_hash_cols_subset(spark):
    from incubator_sedona_spark.partitioning import salt_cells

    df = spark.range(64).select(
        F.col("id"), F.lit(0).alias("cell"), F.lit("same").alias("payload")
    )
    # hashing only the constant payload would collapse every row to one
    # sub-key; naming the id column spreads them
    salted = salt_cells(df, {0: 64}, factor=8, hash_cols=["id"])
    assert salted.select("salt").distinct().count() > 1
    degenerate = salt_cells(df, {0: 64}, factor=8, hash_cols=["payload"])
    assert degenerate.select("salt").distinct().count() == 1

    with pytest.raises(ValueError, match="hash_cols"):
        only_map = spark.range(4).select(
            F.lit(0).alias("cell"),
            F.create_map(F.lit("k"), F.lit("v")).alias("m"),
        )
        salt_cells(only_map, {0: 4}, factor=4)


def test_connected_components_missing_column_message(spark):
    from incubator_sedona_spark.pipeline.components import connected_components

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="'id_bb' not found.*id_a"):
        connected_components(edges, dst="id_bb")


def test_gemm_driver_listing_failure_degrades_to_warning(spark, tmp_path, monkeypatch):
    import incubator_sedona_spark.pipeline.dedup as dd

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8)).astype("float32")
    pdf = [(int(i), [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")

    real = dd._parquet_files_in

    def flaky(path):
        if "__blk=" in path:  # the driver-side existence probe
            raise PermissionError("driver has no credentials for this path")
        return real(path)

    monkeypatch.setattr(dd, "_parquet_files_in", flaky)
    with pytest.warns(RuntimeWarning, match="skipping the driver-side"):
        out = dd.embedding_cosine_pairs_exact(
            df, threshold=-1.0, max_broadcast_rows=8,
            scratch_dir=str(tmp_path / "gemm"),
        )
        # executor-side path unaffected: all 20*19/2 pairs at threshold -1
        assert out.count() == 190
