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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType


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


def pixelize(
    df,
    boundary: tuple[float, float, float, float],
    res_x: int,
    res_y: int,
    geom_col: str = "wkb",
):
    """ST_Pixelize analog (viz/.../expressions/Pixelize.scala:37-110).

    Rasterizes each geometry to the pixels it touches, with exact parity to
    the reference kernel: vertices map through FindOnePixelCoordinate
    (RasterizationUtils.java:59-100) and segments plot via its Bresenham loop
    (:371-452) — which advances from the first pixel while ``!= end`` (the end
    pixel itself is contributed by the next segment), accumulating eps against
    the dominant axis.  Points -> 1 pixel; lines/polygon rings -> edge pixels.

    Output: input rows exploded to (pixel_x int, pixel_y int).
    """
    from incubator_sedona_spark.geom import wkb as W

    minx, miny, maxx, maxy = boundary

    def one(px, py):
        return find_pixel_coordinates([px], [py], boundary, res_x, res_y)[0]

    def bresenham(p1, p2):
        x1, y1 = p1
        x2, y2 = p2
        dx, dy = x2 - x1, y2 - y1
        ux = 1 if dx > 0 else -1
        uy = 1 if dy > 0 else -1
        dx, dy = abs(dx), abs(dy)
        out = []
        x, y = x1, y1
        eps = 0
        if dx > dy:
            while x != x2:
                if 0 <= x < res_x and 0 <= y < res_y:
                    out.append((x, y))
                eps += dy
                if (eps << 1) >= dx:
                    y += uy
                    eps -= dx
                x += ux
        else:
            while y != y2:
                if 0 <= x < res_x and 0 <= y < res_y:
                    out.append((x, y))
                eps += dx
                if (eps << 1) >= dy:
                    x += ux
                    eps -= dy
                y += uy
        return out

    pix_type = ArrayType(
        StructType([StructField("pixel_x", IntegerType()), StructField("pixel_y", IntegerType())])
    )

    @F.pandas_udf(pix_type)
    def _pix(wkbs: pd.Series) -> pd.Series:
        out = []
        cache = {}
        for buf in wkbs:
            key = bytes(buf)
            if key in cache:
                out.append(cache[key])
                continue
            g = W.loads(key)
            pixels = []
            for leaf in g.leaves():
                if leaf.kind == W.POINT:
                    p = leaf.parts[0]
                    pixels.append(one(p[0], p[1]))
                else:
                    rings = leaf.parts if leaf.kind == W.POLYGON else [leaf.parts]
                    for r in rings:
                        pts = [one(c[0], c[1]) for c in r]
                        for a, b in zip(pts[:-1], pts[1:]):
                            pixels.extend(bresenham(a, b))
            cache[key] = pixels
            out.append(pixels)
        return pd.Series(out)

    out = df.withColumn("__pix", F.explode(_pix(F.col(geom_col))))
    return out.withColumn("pixel_x", F.col("__pix.pixel_x")).withColumn(
        "pixel_y", F.col("__pix.pixel_y")
    ).drop("__pix")


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
