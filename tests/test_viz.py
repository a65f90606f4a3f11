"""ST_Colorize / ST_Render / ST_EncodeImage vs reference semantics."""

import base64

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.operators import viz as VZ
from incubator_sedona_spark.sources.images import decode_png


def _java_rgb(a, r, g, b):
    v = (a << 24) | (r << 16) | (g << 8) | b
    return v - (1 << 32) if v >= (1 << 31) else v


def test_colorize_ramp_matches_generic_coloring_rule(spark):
    # GenericColoringRule.java:25-58 boundaries, weight normalized *255/max
    cases = [
        (0, _java_rgb(0, 255, 255, 255)),    # zero -> transparent white
        (1, _java_rgb(150, 0, 255, 0)),      # norm 1 < 5
        (10, _java_rgb(150, 85, 255, 0)),    # 5 <= 10 < 15
        (30, _java_rgb(150, 255, 255, 0)),
        (50, _java_rgb(150, 255, 170, 0)),
        (70, _java_rgb(150, 255, 85, 0)),
        (255, _java_rgb(150, 255, 0, 0)),    # top bucket
    ]
    df = spark.createDataFrame([(w,) for w, _ in cases], "w long")
    got = [
        r.c
        for r in df.select(
            VZ.st_colorize(F.col("w"), 255).alias("c")
        ).collect()
    ]
    assert got == [e for _, e in cases]


def test_colorize_constant_color_and_hex(spark):
    df = spark.range(1)
    c1 = df.select(VZ.st_colorize(F.lit(0), 1, color="red").alias("c")).first().c
    assert c1 == _java_rgb(255, 255, 0, 0)
    c2 = df.select(VZ.st_colorize(F.lit(0), 1, color="#0080FF").alias("c")).first().c
    assert c2 == _java_rgb(255, 0, 128, 255)
    with pytest.raises(ValueError):
        VZ.parse_color("no-such-color")


def test_render_and_encode_roundtrip(spark):
    # 4x4 canvas, two zones; y flipped (row 0 = top)
    red, green = _java_rgb(150, 255, 0, 0), _java_rgb(150, 0, 255, 0)
    rows = [
        (0, 0, 0, red),    # zone 0: pixel (0, 0) -> image row 3 (flip)
        (0, 1, 3, green),  # pixel (1, 3) -> image row 0
        (1, 2, 2, red),
    ]
    df = spark.createDataFrame(rows, "zone long, px int, py int, color int")
    imgs = VZ.render_images(df, ["zone"], res_x=4, res_y=4)
    by_zone = {r.zone: r.image for r in imgs.collect()}
    z0 = np.asarray(by_zone[0].argb, dtype=np.int64).reshape(4, 4)
    assert z0[3, 0] == red and z0[0, 1] == green
    assert (z0 != 0).sum() == 2

    enc = imgs.where("zone = 0").select(VZ.st_encode_image(F.col("image")).alias("b64"))
    png = base64.b64decode(enc.first().b64)
    pix = decode_png(png, keep_alpha=True)
    assert pix.shape == (4, 4, 4)
    assert tuple(pix[3, 0]) == (255, 0, 0, 150)   # red, alpha 150
    assert tuple(pix[0, 1]) == (0, 255, 0, 150)
    assert pix[1, 1, 3] == 0                       # untouched -> transparent


def test_render_zoom_tiles(spark):
    # zoom=1 on a 4x4 canvas -> 2x2 tiles; coords taken mod tile size
    c = _java_rgb(150, 255, 0, 0)
    df = spark.createDataFrame([(0, 3, 3, c)], "zone long, px int, py int, color int")
    img = VZ.render_images(df, ["zone"], res_x=4, res_y=4, zoom=1).first().image
    assert img.w == 2 and img.h == 2
    arr = np.asarray(img.argb).reshape(2, 2)
    # flipped y = (4 - 3 - 1) % 2 = 0, x = 3 % 2 = 1
    assert arr[0, 1] == c


def test_pixelize_colorize_render_pipeline(spark):
    """End-to-end viz pipeline: points -> pixelize -> per-pixel counts ->
    colorize -> render -> encode (the reference's heatmap tutorial flow)."""
    from incubator_sedona_spark.operators.tiling import assign_tiles

    n = 500
    pts = spark.range(n).select(
        (F.col("id") % 97 * 1.03).alias("x"), (F.col("id") % 89 * 1.11).alias("y")
    )
    px = assign_tiles(pts, "x", "y", (0.0, 0.0, 100.0, 100.0), 16, 16)
    counts = px.groupBy("tile_x", "tile_y").agg(F.count("*").alias("cnt"))
    mx = counts.agg(F.max("cnt")).first()[0]
    colored = counts.select(
        F.lit(0).alias("g"),
        F.col("tile_x").alias("px"),
        F.col("tile_y").alias("py"),
        VZ.st_colorize(F.col("cnt"), float(mx)).alias("color"),
    )
    img = VZ.render_images(colored, ["g"], res_x=16, res_y=16).first().image
    b64 = (
        VZ.render_images(colored, ["g"], res_x=16, res_y=16)
        .select(VZ.st_encode_image(F.col("image")).alias("b"))
        .first()
        .b
    )
    pix = decode_png(base64.b64decode(b64), keep_alpha=True)
    assert pix.shape == (16, 16, 4)
    assert (np.asarray(img.argb) != 0).sum() == counts.count()
