"""Structured Streaming surface.

The reference's only streaming contract is that its expressions run unchanged
inside Structured Streaming queries (no watermarks / stateful operators
anywhere in the repo; tested by
/root/reference/python/tests/streaming/spark/test_constructor_functions.py:327-336).
This engine inherits that for free — every operator here is a stateless column
transform — and adds the two streaming composites a tile-serving pipeline needs:
per-micro-batch enrichment (cells + tiles) and watermarked windowed tile counts
(an *extension* over the reference, which has no event-time handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.operators.tiling import tile_coordinate_cols


def streaming_enrich(
    stream: DataFrame,
    grid: Grid,
    x_col: str,
    y_col: str,
    boundary: tuple[float, float, float, float],
    res: int,
) -> DataFrame:
    """Attach cell id + tile coords to a streaming DataFrame (stateless)."""
    tx, ty = tile_coordinate_cols(F.col(x_col), F.col(y_col), boundary, res, res)
    return (
        stream.withColumn("cell", grid.point_cell_col(F.col(x_col), F.col(y_col)))
        .withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
    )


def streaming_tile_counts(
    stream: DataFrame,
    grid: Grid,
    x_col: str,
    y_col: str,
    boundary: tuple[float, float, float, float],
    res: int,
    ts_col: str | None = None,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tile-count aggregation over a stream; event-time windowed when ts given."""
    enriched = streaming_enrich(stream, grid, x_col, y_col, boundary, res)
    if ts_col is None:
        return enriched.groupBy("tile_x", "tile_y").agg(F.count("*").alias("cnt"))
    return (
        enriched.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), "tile_x", "tile_y")
        .agg(F.count("*").alias("cnt"))
    )
