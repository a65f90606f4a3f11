"""Raster (RS_*) operators: band algebra, pixel lookup, raster<->vector joins.

Band algebra mirrors the reference's array<double> map-algebra family
(/root/reference/sql/common/src/main/scala/org/apache/sedona/sql/expressions/raster/MapAlgebra.scala:33-870)
— but as Spark higher-order functions (transform / zip_with / aggregate /
filter), which run JVM-side inside codegen instead of per-row Scala loops, and
never leave the executor.

Raster<->vector join composes exactly as the reference does: the raster's
footprint polygon (RS_Envelope analog, common/.../raster/RasterAccessors.java:56)
joins against vector geometries through the ordinary spatial join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.operators.joins import spatial_join


# -- band algebra (array<double> columns), all pure Catalyst -----------------

def rs_add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)


def rs_subtract(a: Column, b: Column) -> Column:
    # reference MapAlgebra.scala RS_Subtract computes (second - first)
    return F.zip_with(a, b, lambda x, y: y - x)


def rs_multiply(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x * y)


def rs_divide(a: Column, b: Column) -> Column:
    # reference divideBands computes band1/band2, rounded to 2 decimals
    # (MapAlgebra.scala RS_Divide; the argument swap is correct for RS_Subtract only)
    return F.zip_with(a, b, lambda x, y: F.round(x / y, 2))


def rs_multiply_factor(a: Column, factor) -> Column:
    return F.transform(a, lambda x: x * factor)


def rs_modulo(a: Column, m) -> Column:
    return F.transform(a, lambda x: x % m)


def rs_square_root(a: Column) -> Column:
    return F.transform(a, lambda x: F.round(F.sqrt(x), 2))


def rs_mean(a: Column) -> Column:
    # reference returns full-precision mean of the band
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x, lambda acc: acc / F.size(a)
    )


def rs_count(a: Column, target) -> Column:
    return F.size(F.filter(a, lambda x: x == target))


def rs_greater_than(a: Column, t) -> Column:
    return F.transform(a, lambda x: F.when(x > t, 1.0).otherwise(0.0))


def rs_greater_than_equal(a: Column, t) -> Column:
    return F.transform(a, lambda x: F.when(x >= t, 1.0).otherwise(0.0))


def rs_less_than(a: Column, t) -> Column:
    return F.transform(a, lambda x: F.when(x < t, 1.0).otherwise(0.0))


def rs_less_than_equal(a: Column, t) -> Column:
    return F.transform(a, lambda x: F.when(x <= t, 1.0).otherwise(0.0))


def rs_normalized_difference(a: Column, b: Column) -> Column:
    """(b - a) / (b + a), 0 where the sum is 0; reference rounds to 2 decimals
    (MapAlgebra.scala RS_NormalizedDifference)."""
    return F.zip_with(
        a,
        b,
        lambda x, y: F.when((y + x) == 0.0, 0.0).otherwise(F.round((y - x) / (y + x), 2)),
    )


def rs_normalize(a: Column) -> Column:
    """Scale band to 0..255 (MapAlgebra.scala RS_Normalize)."""
    mx = F.array_max(a)
    return F.transform(a, lambda x: x * 255.0 / mx)


def rs_append(a: Column, extra: Column) -> Column:
    return F.concat(a, extra)


def rs_fetch_region(a: Column, y0: int, x0: int, y1: int, x1: int, width: int) -> Column:
    """Rectangular sub-region of a row-major band (RS_FetchRegion analog)."""
    rows = F.sequence(F.lit(y0), F.lit(y1))
    return F.flatten(
        F.transform(rows, lambda r: F.slice(a, r * width + x0 + 1, x1 - x0 + 1))
    )


# -- pixel lookup (RS_Value analog) -------------------------------------------

def rs_value(
    data: Column,
    width: Column,
    xmin: Column,
    ymin: Column,
    xmax: Column,
    ymax: Column,
    height: Column,
    px: Column,
    py: Column,
) -> Column:
    """Band value at a world coordinate: affine world->grid transform then
    array index (PixelFunctions.java:39-44 analog).  Row 0 = top (north)."""
    col = F.floor((px - xmin) / ((xmax - xmin) / width)).cast("int")
    row = F.floor((ymax - py) / ((ymax - ymin) / height)).cast("int")
    col = F.least(width.cast("int") - 1, F.greatest(F.lit(0), col))
    row = F.least(height.cast("int") - 1, F.greatest(F.lit(0), row))
    return F.element_at(data, (row * width.cast("int") + col + 1).cast("int"))


# -- raster <-> vector join ----------------------------------------------------

def raster_vector_join(
    rasters: DataFrame,
    vectors: DataFrame,
    predicate: str = "intersects",
    footprint_col: str = "footprint_wkb",
    vector_geom: str = "wkb",
    grid: Grid | None = None,
    **kw,
) -> DataFrame:
    """Join raster tiles to vector geometries via footprint polygons.

    Exactly the reference's composition: RS_Envelope -> RangeJoin.
    """
    return spatial_join(
        rasters, vectors, predicate, left_geom=footprint_col, right_geom=vector_geom,
        grid=grid, **kw,
    )
