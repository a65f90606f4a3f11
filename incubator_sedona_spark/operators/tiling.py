"""Tiling / pixelization — tile assignment with exact reference parity.

Replicates the reference viz kernel
(/root/reference/viz/src/main/java/org/apache/sedona/viz/utils/RasterizationUtils.java:59-100,
``FindOnePixelCoordinate``) as pure Catalyst expressions, including its two
edge corrections (:87-98):

    pixel = trunc((v - min) / (max - min) * res)          # Java .intValue()
    if fmod(v - min, max - min) == 0.0 and pixel_d != 0:  pixel -= 1
    if pixel >= res:                                       pixel -= 1

and the tile partitioner (VisualizationPartitioner.java:79-127): pixel space
split into partitionX x partitionY uniform tiles, partition id in row-major
order.  Tile names follow the z-x-y convention (ST_TileName analog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one_axis(v: Column, lo: float, hi: float, res: int) -> Column:
    """FindOnePixelCoordinate for one axis (RasterizationUtils.java:81-98)."""
    span = hi - lo
    pix_d = (v - F.lit(lo)) / F.lit(span) * F.lit(res)
    rem = (v - F.lit(lo)) % F.lit(span)
    pix = pix_d.cast("int")  # Java Double.intValue(): truncation toward zero
    pix = F.when((rem == 0.0) & (pix_d != 0.0), pix - 1).otherwise(pix)
    pix = F.when(pix >= res, pix - 1).otherwise(pix)
    return pix


def tile_coordinate_cols(
    x: Column,
    y: Column,
    boundary: tuple[float, float, float, float],
    res_x: int,
    res_y: int,
    reverse: bool = False,
) -> tuple[Column, Column]:
    """(tile_x, tile_y) columns with exact reference edge semantics."""
    minx, miny, maxx, maxy = boundary
    if reverse:
        x, y = y, x
        minx, miny, maxx, maxy = miny, minx, maxy, maxx
    return _one_axis(x, minx, maxx, res_x), _one_axis(y, miny, maxy, res_y)


def assign_tiles(
    df: DataFrame,
    x_col: str,
    y_col: str,
    boundary: tuple[float, float, float, float],
    res_x: int,
    res_y: int,
    partitions_x: int = 0,
    partitions_y: int = 0,
    zoom: int | None = None,
) -> DataFrame:
    """Attach tile_x / tile_y / tile_id (+ tile partition id and z-x-y name).

    All pure Catalyst arithmetic — tile assignment of 10^12 points is a
    codegen'd projection, no Python anywhere.
    """
    tx, ty = tile_coordinate_cols(F.col(x_col), F.col(y_col), boundary, res_x, res_y)
    out = df.withColumn("tile_x", tx).withColumn("tile_y", ty)
    out = out.withColumn(
        "tile_id", (F.col("tile_y").cast("long") * res_x + F.col("tile_x")).cast("long")
    )
    if partitions_x and partitions_y:
        # VisualizationPartitioner.CalculatePartitionId analog
        px = (F.col("tile_x") / (res_x // partitions_x)).cast("int")
        py = (F.col("tile_y") / (res_y // partitions_y)).cast("int")
        px = F.least(F.lit(partitions_x - 1), px)
        py = F.least(F.lit(partitions_y - 1), py)
        out = out.withColumn("tile_partition", py * partitions_x + px)
    if zoom is not None:
        out = out.withColumn(
            "tile_name",
            F.concat_ws("-", F.lit(zoom), F.col("tile_x"), F.col("tile_y")),
        )
    return out


def tile_counts(df_tiled: DataFrame) -> DataFrame:
    """Per-tile aggregation (pixel aggregation stage of the viz pipeline).

    Map-side partial aggregation + shuffle on tile_id — Catalyst's
    HashAggregate pair, the scalable form of the reference's
    CountingAggregator.
    """
    return df_tiled.groupBy("tile_x", "tile_y").agg(F.count("*").alias("cnt"))


def find_pixel_coordinates(
    xs, ys, boundary: tuple[float, float, float, float], res_x: int, res_y: int
):
    """Numpy mirror of the tile assignment (for golden-vector tests)."""
    import numpy as np

    minx, miny, maxx, maxy = boundary
    out = []
    for x, y in zip(np.atleast_1d(xs), np.atleast_1d(ys)):
        pxd = (x - minx) / (maxx - minx) * res_x
        pyd = (y - miny) / (maxy - miny) * res_y
        xrem = np.fmod(x - minx, maxx - minx)
        yrem = np.fmod(y - miny, maxy - miny)
        px, py = int(pxd), int(pyd)
        if xrem == 0.0 and pxd != 0.0:
            px -= 1
        if px >= res_x:
            px -= 1
        if yrem == 0.0 and pyd != 0.0:
            py -= 1
        if py >= res_y:
            py -= 1
        out.append((px, py))
    return out
