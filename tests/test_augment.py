"""Seeded augmentation (sources/augment.py): identity case, determinism,
epoch separation, flip/crop geometry."""

import numpy as np
import pytest

from incubator_sedona_spark.sources.augment import (
    augment_images_df,
    augment_params,
    augment_pixels,
    unit_hash,
)
from incubator_sedona_spark.sources.images import decode_image, encode_png


def _img(k, h=12, w=10):
    rng = np.random.RandomState(k)
    return rng.randint(0, 255, size=(h, w, 3)).astype(np.uint8)


def test_identity_case():
    a = _img(1)
    out = augment_pixels(a, 12, 10, flip=False, scale=1.0, cx=0.3, cy=0.7)
    assert np.array_equal(out, a)


def test_flip_and_corner_crops():
    a = _img(2, 8, 8)
    assert np.array_equal(
        augment_pixels(a, 8, 8, True, 1.0, 0.0, 0.0), a[:, ::-1]
    )
    # scale .5 at the four corners picks the exact quadrants
    assert np.array_equal(augment_pixels(a, 4, 4, False, 0.5, 0.0, 0.0),
                          a[:4, :4])
    assert np.array_equal(augment_pixels(a, 4, 4, False, 0.5, 1.0, 1.0),
                          a[4:, 4:])
    assert np.array_equal(augment_pixels(a, 4, 4, False, 0.5, 1.0, 0.0),
                          a[:4, 4:])


def test_param_validation():
    a = _img(3)
    with pytest.raises(ValueError, match="scale"):
        augment_pixels(a, 4, 4, False, 0.0, 0.5, 0.5)
    with pytest.raises(ValueError, match="cx/cy"):
        augment_pixels(a, 4, 4, False, 0.5, 1.5, 0.5)


def test_params_deterministic_and_seed_sensitive():
    p0 = augment_params("img7", 0, 0.5, (0.6, 1.0))
    assert augment_params("img7", 0, 0.5, (0.6, 1.0)) == p0
    assert augment_params("img7", 1, 0.5, (0.6, 1.0)) != p0
    assert augment_params("img8", 0, 0.5, (0.6, 1.0)) != p0
    _, s, cx, cy = p0
    assert 0.6 <= s <= 1.0 and 0.0 <= cx < 1.0 and 0.0 <= cy < 1.0
    # flip_p edges
    assert augment_params("x", 0, 1.0, (1.0, 1.0))[0] is True
    assert augment_params("x", 0, 0.0, (1.0, 1.0))[0] is False
    assert 0.0 <= unit_hash("k") < 1.0


def test_df_bitwise_reproducible_and_epoch_separated(spark):
    rows = [("im%02d" % i, encode_png(_img(i, 16, 14))) for i in range(12)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    run = lambda seed: {  # noqa: E731
        r["image_id"]: bytes(r["bytes"])
        for r in augment_images_df(df, 8, 8, seed=seed).collect()
    }
    a, b, other = run(0), run(0), run(1)
    assert a == b  # same seed: byte-identical across runs
    assert any(a[k] != other[k] for k in a)  # new epoch: new augmentations
    # outputs decode at the requested size and replay the pure function
    r0 = augment_images_df(df, 8, 8, seed=0).collect()[0]
    assert (r0["w"], r0["h"], r0["fmt"]) == (8, 8, "png")
    flip, s, cx, cy = augment_params(r0["image_id"], 0, 0.5, (0.6, 1.0))
    src = dict(rows)[r0["image_id"]]
    want = augment_pixels(decode_image(src), 8, 8, flip, s, cx, cy)
    assert np.array_equal(decode_image(bytes(r0["bytes"])), want)
