"""Visualization tail: ST_Colorize / ST_Render / ST_EncodeImage.

Reference: viz/src/main/scala/org/apache/spark/sql/sedona_viz/expressions/
{Colorize,Render,ImageEncoder}.scala + the GenericColoringRule heat ramp
(viz/src/main/java/.../coloringRule/GenericColoringRule.java:25-58).

Spark-first shapes:
- ``st_colorize`` is a pure-Catalyst CASE chain producing the same signed
  ARGB int32 as java.awt.Color.getRGB for the reference's 8-step heat ramp
  (alpha 150; zero weight -> fully transparent white).
- ``render_images`` replaces the reference's UDAF (which concatenates
  per-pixel arrays in the aggregation buffer) with groupBy + collect_list +
  one Arrow-batched scatter per image: the shuffle carries exactly the same
  (x, y, color) triples the UDAF buffers, but map-side combine and Tungsten
  handle the heavy lifting.
- ``st_encode_image`` emits base64 PNG (RGBA, real encoder) — the
  ImageWrapper serialization analog.
"""

from __future__ import annotations

import base64

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# GenericColoringRule.java ramp: (upper-exclusive normalized bound, r, g, b)
_ALPHA = 150
_RAMP = [
    (5, 0, 255, 0),
    (15, 85, 255, 0),
    (25, 170, 255, 0),
    (35, 255, 255, 0),
    (45, 255, 255, 0),
    (60, 255, 170, 0),
    (80, 255, 85, 0),
]
_TOP = (255, 0, 0)

_NAMED_COLORS = {
    "white": (255, 255, 255), "black": (0, 0, 0), "red": (255, 0, 0),
    "green": (0, 255, 0), "blue": (0, 0, 255), "yellow": (255, 255, 0),
    "cyan": (0, 255, 255), "magenta": (255, 0, 255), "gray": (128, 128, 128),
    "orange": (255, 200, 0), "pink": (255, 175, 175),
}


def _argb(a: int, r: int, g: int, b: int) -> int:
    v = (a << 24) | (r << 16) | (g << 8) | b
    return v - (1 << 32) if v >= (1 << 31) else v  # java int (signed)


def parse_color(name: str) -> int:
    """awt ColorFactory subset: named colors + '#RRGGBB' hex, full alpha."""
    s = name.strip().lower()
    if s.startswith("#") and len(s) == 7:
        return _argb(255, int(s[1:3], 16), int(s[3:5], 16), int(s[5:7], 16))
    if s in _NAMED_COLORS:
        return _argb(255, *_NAMED_COLORS[s])
    raise ValueError(f"unknown color {name!r}")


def st_colorize(weight: Column, max_weight, color: str | None = None) -> Column:
    """ST_Colorize (Colorize.scala:31-69): constant color when ``color`` is
    given, else the GenericColoringRule heat ramp over weight*255/max."""
    if color is not None:
        return F.lit(parse_color(color))
    mx = max_weight if isinstance(max_weight, Column) else F.lit(max_weight)
    norm = weight.cast("double") * 255.0 / mx.cast("double")
    expr = F.lit(_argb(_ALPHA, *_TOP))
    for bound, r, g, b in reversed(_RAMP):
        expr = F.when(norm < F.lit(float(bound)), F.lit(_argb(_ALPHA, r, g, b))).otherwise(expr)
    return F.when(norm == 0.0, F.lit(_argb(0, 255, 255, 255))).otherwise(expr)


IMAGE_SCHEMA = "struct<w:int,h:int,argb:array<int>>"


def render_images(
    df: DataFrame,
    group_cols: list[str],
    x_col: str = "px",
    y_col: str = "py",
    color_col: str = "color",
    res_x: int = 256,
    res_y: int = 256,
    zoom: int | None = None,
) -> DataFrame:
    """ST_Render analog: one image struct per group from (pixel, color) rows.

    Reference semantics preserved (Render.scala:59-77): y is flipped
    (row 0 = top), and with ``zoom`` the resolution is truncated to
    res/2^zoom with pixel coordinates taken modulo the tile size.  Later
    rows win on collisions (the BufferedImage setRGB overwrite order).
    """
    n_parts = 1 if zoom is None else 2**zoom
    w, h = int(res_x // n_parts), int(res_y // n_parts)
    flipped = (F.lit(int(res_y)) - F.col(y_col) - 1) % F.lit(h)
    px = F.col(x_col) % F.lit(w)
    rows = df.groupBy(*group_cols).agg(
        F.collect_list(
            F.struct(
                px.cast("int").alias("x"),
                flipped.cast("int").alias("y"),
                F.col(color_col).cast("int").alias("c"),
            )
        ).alias("__px")
    )

    @F.pandas_udf(IMAGE_SCHEMA)
    def _scatter(s: pd.Series) -> pd.DataFrame:
        out = []
        for pixels in s:
            img = np.zeros(w * h, dtype=np.int64)  # 0 = transparent black
            for p in pixels:
                img[p["y"] * w + p["x"]] = p["c"]
            out.append((w, h, img.astype(np.int32).tolist()))
        return pd.DataFrame(out, columns=["w", "h", "argb"])

    return rows.select(*group_cols, _scatter(F.col("__px")).alias("image"))


def st_encode_image(image_col: Column) -> Column:
    """ST_EncodeImage: image struct -> base64 PNG string (RGBA, real
    encoder — ImageEncoder.scala writes ImageIO png the same way)."""
    from incubator_sedona_spark.sources.images import encode_png

    @F.pandas_udf(StringType())
    def _f(frame: pd.DataFrame) -> pd.Series:
        out = []
        for _, row in frame.iterrows():
            w, h = int(row["w"]), int(row["h"])
            argb = np.asarray(row["argb"], dtype=np.int64).astype(np.uint32)
            argb = argb.reshape(h, w)
            rgba = np.empty((h, w, 4), dtype=np.uint8)
            rgba[:, :, 0] = (argb >> 16) & 0xFF
            rgba[:, :, 1] = (argb >> 8) & 0xFF
            rgba[:, :, 2] = argb & 0xFF
            rgba[:, :, 3] = (argb >> 24) & 0xFF
            out.append(base64.b64encode(encode_png(rgba)).decode("ascii"))
        return pd.Series(out)

    return _f(image_col)
