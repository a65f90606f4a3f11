"""Zonal statistics (operators/raster.py): rect fast path vs the general
kernel path, pixel-center half-open rules, empty zones, skewed affines."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.operators import raster as R


def _raster_df(spark, ulx=0.0, uly=8.0, px=2.0):
    # 4x4 band: value = row*4 + col
    idx = F.sequence(F.lit(0), F.lit(15))
    band = F.transform(idx, lambda i: i.cast("double"))
    r = R.rs_make_empty_raster(1, 4, 4, ulx, uly, pixel_size=px)
    r = R.rs_add_band_from_array(r, band, 1)
    return spark.range(1).select(r.alias("r"))


def test_rect_zonal_known_values(spark):
    # centers: cx in {1,3,5,7}, cy in {7,5,3,1}; zone [2,6)x[2,6) keeps
    # cols {1,2} rows {1,2} -> values {5,6,9,10}
    df = _raster_df(spark)
    z = df.select(R.rs_zonal_stats_rect(F.col("r"), 2, 2, 6, 6).alias("z")) \
        .select("z.*").first()
    assert (z["zcount"], z["zsum"], z["zmin"], z["zmax"], z["zmean"]) == \
        (4, 30.0, 5.0, 10.0, 7.5)


def test_rect_zonal_half_open_boundaries(spark):
    df = _raster_df(spark)
    # xmin exactly on centers col 0 (cx=1): inclusive; xmax on col 2 (cx=5):
    # exclusive -> cols {0,1}; full y -> 8 pixels
    z = df.select(R.rs_zonal_stats_rect(F.col("r"), 1, 0, 5, 8).alias("z")) \
        .select("z.*").first()
    assert z["zcount"] == 8
    assert z["zmin"] == 0.0 and z["zmax"] == 13.0


def test_rect_zonal_empty_zone(spark):
    df = _raster_df(spark)
    z = df.select(R.rs_zonal_stats_rect(F.col("r"), 100, 100, 101, 101)
                  .alias("z")).select("z.*").first()
    assert z["zcount"] == 0
    assert z["zsum"] is None and z["zmean"] is None


def test_general_zonal_matches_rect_on_boxes(spark):
    df = _raster_df(spark).withColumn(
        "wkb", F.lit(bytearray(W.dumps(W.box(2.0, 2.0, 6.0, 6.0))))
    )
    got = R.zonal_stats_df(df).select("zcount", "zsum", "zmin", "zmax",
                                      "zmean").first()
    rect = _raster_df(spark).select(
        R.rs_zonal_stats_rect(F.col("r"), 2, 2, 6, 6).alias("z")
    ).select("z.*").first()
    assert tuple(got) == tuple(rect)


def test_general_zonal_triangle(spark):
    # triangle covering the lower-left half (below the anti-diagonal y=x):
    # strictly-inside centers of the 8x8 world
    tri = W.polygon([(0.0, 0.0), (8.0, 0.0), (0.0, 8.0)])
    df = _raster_df(spark).withColumn("wkb", F.lit(bytearray(W.dumps(tri))))
    got = R.zonal_stats_df(df).first()
    cols = np.tile(np.arange(4) * 2.0 + 1.0, 4)
    rows_y = np.repeat(8.0 - (np.arange(4) * 2.0 + 1.0), 4)
    vals = np.arange(16, dtype=float)
    mask = cols + rows_y < 8.0  # interior of the right triangle
    # boundary centers (cx+cy==8) lie ON the hypotenuse: covers() includes
    # them, so recompute the expectation with <=
    mask_cover = cols + rows_y <= 8.0
    assert got["zcount"] in (int(mask.sum()), int(mask_cover.sum()))
    expect = vals[mask_cover] if got["zcount"] == mask_cover.sum() else vals[mask]
    assert got["zsum"] == pytest.approx(expect.sum())


def test_general_zonal_with_skew(spark):
    # skewed affine: centers shift by skew_x per row; a box zone placed to
    # catch exactly the first row's shifted centers
    idx = F.sequence(F.lit(0), F.lit(3))
    band = F.transform(idx, lambda i: (i + 1).cast("double"))
    r = R.rs_make_empty_raster(1, 2, 2, 0.0, 4.0, pixel_size=2.0, skew_x=1.0)
    r = R.rs_add_band_from_array(r, band, 1)
    df = spark.range(1).select(r.alias("r")).withColumn(
        "wkb", F.lit(bytearray(W.dumps(W.box(0.0, 2.0, 6.0, 4.0))))
    )
    got = R.zonal_stats_df(df).first()
    # row 0 centers: cx = (c+0.5)*2 + 0.5*1 in {1.5, 3.5}, cy = 3 -> in zone
    # row 1 centers: cy = 1 -> out
    assert got["zcount"] == 2
    assert got["zsum"] == 1.0 + 2.0
    # rect fast path agrees on the same skewed raster
    rect = df.select(R.rs_zonal_stats_rect(F.col("r"), 0, 2, 6, 4).alias("z")) \
        .select("z.*").first()
    assert (rect["zcount"], rect["zsum"]) == (2, 3.0)


def test_boundary_center_semantics_differ_by_path(spark):
    """Pinned behavior: a zone edge ON pixel centers — the rect path is
    half-open (max edge excluded), the general WKB path uses closed
    covers() (boundary counts).  See the membership-rule comment in
    operators/raster.py."""
    df = _raster_df(spark)  # centers cx in {1,3,5,7}, cy in {7,5,3,1}
    # xmax = 5 lies exactly on the col-2 centers
    rect = df.select(R.rs_zonal_stats_rect(F.col("r"), 0, 0, 5, 8).alias("z")) \
        .select("z.*").first()
    assert rect["zcount"] == 8  # cols {0,1} only: half-open excludes cx=5
    gen = R.zonal_stats_df(
        df.withColumn("wkb", F.lit(bytearray(W.dumps(W.box(0.0, 0.0, 5.0, 8.0)))))
    ).first()
    assert gen["zcount"] == 12  # cols {0,1,2}: covers() includes cx=5
