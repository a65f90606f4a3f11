"""resize_pixels / center_crop_pixels / resize_images_df (sources/images.py)
— the brief's multimodal 'resize' stage.  Hand-computed bilinear goldens
(half-pixel centers, edge clamp) plus invariance properties."""

import numpy as np
import pandas as pd
import pytest

from incubator_sedona_spark.sources import images as IM


def test_bilinear_2x_hand_computed():
    # 2x2 grayscale-ish ramp -> 4x4: output centers at source coords
    # (-0.25, 0.25, 0.75, 1.25) clamped to [0, 1]
    src = np.zeros((2, 2, 3), np.uint8)
    src[:, :, 0] = [[0, 100], [200, 60]]
    out = IM.resize_pixels(src, 4, 4)
    # sample positions after clamp: [0, 0.25, 0.75, 1.0]
    pos = np.array([0.0, 0.25, 0.75, 1.0])
    row0 = np.array([[0, 100]])  # top row: interpolate between 0 and 100
    expect_00 = 0 * (1 - pos[0]) + 100 * pos[0]
    assert out[0, 0, 0] == round(expect_00)
    # center of the image: y=0.25 between rows, x=0.25 between cols
    v = (1 - 0.25) * ((1 - 0.25) * 0 + 0.25 * 100) + 0.25 * ((1 - 0.25) * 200 + 0.25 * 60)
    assert out[1, 1, 0] == round(v)
    # corners clamp to the source corners exactly
    assert out[0, 0, 0] == 0 and out[0, 3, 0] == 100
    assert out[3, 0, 0] == 200 and out[3, 3, 0] == 60


def test_constant_image_invariance():
    src = np.full((7, 13, 3), 77, np.uint8)
    for method in ("bilinear", "nearest"):
        for shape in ((3, 5), (14, 26), (1, 1), (50, 2)):
            out = IM.resize_pixels(src, *shape, method=method)
            assert out.shape == (*shape, 3)
            assert (out == 77).all(), (method, shape)


def test_identity_resize_is_exact():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 256, (9, 11, 3), np.uint8)
    for method in ("bilinear", "nearest"):
        assert np.array_equal(IM.resize_pixels(src, 9, 11, method), src)


def test_nearest_never_invents_colors():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    rng = np.random.RandomState(1)
    src = pal[rng.randint(0, 3, (8, 8))]
    out = IM.resize_pixels(src, 21, 5, method="nearest")
    seen = {tuple(p) for p in out.reshape(-1, 3)}
    assert seen <= {tuple(p) for p in pal}


def test_downscale_averages():
    # 2x2 blocks of a checkerboard average to the midpoint under 2x bilinear
    # downscale (sample centers land exactly between the four pixels)
    src = np.zeros((4, 4, 3), np.uint8)
    src[::2, ::2] = 100
    src[1::2, 1::2] = 100
    out = IM.resize_pixels(src, 2, 2)
    assert (out == 50).all()


def test_center_crop():
    src = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    out = IM.center_crop_pixels(src, 3, 2)
    assert np.array_equal(out, src[1:4, 2:4])
    with pytest.raises(ValueError, match="exceeds"):
        IM.center_crop_pixels(src, 6, 2)


def test_resize_images_df(spark):
    rng = np.random.RandomState(2)
    pix = [rng.randint(0, 256, (24, 32, 3), np.uint8) for _ in range(3)]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["a", "b", "c"],
                "bytes": [IM.encode_png(p) for p in pix],
                "w": np.int32(32),
                "h": np.int32(24),
                "fmt": "png",
                "caption": ["x", "y", "z"],
            }
        )
    )
    got = IM.resize_images_df(df, 16, 12, crop=(24, 24)).orderBy("image_id").collect()
    assert [r["image_id"] for r in got] == ["a", "b", "c"]
    for r, p in zip(got, pix):
        assert (r["w"], r["h"], r["fmt"]) == (16, 12, "png")
        dec = IM.decode_png(bytes(r["bytes"]))
        expect = IM.resize_pixels(IM.center_crop_pixels(p, 24, 24), 12, 16)
        assert np.array_equal(dec, expect)
        assert r["caption"] in ("x", "y", "z")  # passthrough column survives
