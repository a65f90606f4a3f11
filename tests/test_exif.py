"""EXIF parse/write/auto-orient (sources/exif.py).

Orientation-transform goldens are hand-derived from the EXIF 2.32 §4.6.4
row0/col0 table (the same mapping PIL ImageOps.exif_transpose uses); the
writer/parser round-trip breaks circularity by also parsing a hand-packed
big-endian (MM) segment the writer never emits.
"""

import struct

import numpy as np
import pytest

from incubator_sedona_spark.sources.exif import (
    apply_orientation,
    build_exif_app1,
    exif_df,
    insert_app1,
    parse_exif,
)
from incubator_sedona_spark.sources.images import (
    decode_image,
    decode_images_df,
    encode_png,
)
from incubator_sedona_spark.sources.jpeg_encode import encode_jpeg


def _grad(h=6, w=4):
    rng = np.random.RandomState(7)
    return rng.randint(0, 255, size=(h, w, 3)).astype(np.uint8)


# -- orientation transform table ---------------------------------------------

def test_orientation_goldens_2x3():
    # stored pixels a..f laid out 2 rows x 3 cols, single channel broadcast
    a = np.arange(6).reshape(2, 3, 1)
    # EXIF semantics: value k means the 0th stored row / 0th stored column
    # map to the named visual edge; the table below is the UNDO transform.
    got = {k: apply_orientation(a, k)[:, :, 0].tolist() for k in range(1, 9)}
    assert got[1] == [[0, 1, 2], [3, 4, 5]]
    assert got[2] == [[2, 1, 0], [5, 4, 3]]            # mirror horizontal
    assert got[3] == [[5, 4, 3], [2, 1, 0]]            # rotate 180
    assert got[4] == [[3, 4, 5], [0, 1, 2]]            # mirror vertical
    assert got[5] == [[0, 3], [1, 4], [2, 5]]          # transpose
    assert got[6] == [[3, 0], [4, 1], [5, 2]]          # rotate 90 CW
    assert got[7] == [[5, 2], [4, 1], [3, 0]]          # transverse
    assert got[8] == [[2, 5], [1, 4], [0, 3]]          # rotate 90 CCW


def test_orientation_involutions():
    a = _grad()
    for k in (2, 3, 4, 5, 7):  # mirrors/transposes are involutions
        assert np.array_equal(apply_orientation(apply_orientation(a, k), k), a)
    # the two rotations invert each other
    assert np.array_equal(apply_orientation(apply_orientation(a, 6), 8), a)
    with pytest.raises(ValueError, match="1..8"):
        apply_orientation(a, 9)


# -- writer/parser round trip -------------------------------------------------

def test_app1_roundtrip_all_orientations():
    base = encode_jpeg(_grad())
    for k in range(1, 9):
        tagged = insert_app1(base, build_exif_app1(k, make="AcmeCam",
                                                   model="X100 Ultra"))
        meta = parse_exif(tagged)
        assert meta["orientation"] == k
        assert meta["make"] == "AcmeCam"
        assert meta["model"] == "X100 Ultra"
        # the tagged stream still decodes to the same stored pixels
        assert np.array_equal(decode_image(tagged), decode_image(base))


def test_parse_big_endian_hand_packed():
    # hand-packed MM segment (writer emits II, so this is an independent
    # fixture): IFD0 with Orientation=6 at offset 8
    bo = ">"
    ifd = struct.pack(bo + "H", 1) + struct.pack(
        bo + "HHIHH", 0x0112, 3, 1, 6, 0
    ) + struct.pack(bo + "I", 0)
    tiff = b"MM" + struct.pack(bo + "HI", 42, 8) + ifd
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    jpeg = insert_app1(encode_jpeg(_grad(2, 2)), app1)
    assert parse_exif(jpeg)["orientation"] == 6


def test_exifless_defaults():
    png = encode_png(_grad())
    meta = parse_exif(png)
    assert meta == {"orientation": 1, "make": None, "model": None,
                    "datetime": None, "pixel_x": None, "pixel_y": None}
    jpeg = encode_jpeg(_grad())
    assert parse_exif(jpeg)["orientation"] == 1


# -- Spark plumbing -----------------------------------------------------------

def test_exif_df_and_auto_orient(spark):
    base_px = _grad(8, 6)
    plain = encode_jpeg(base_px)
    rot = insert_app1(plain, build_exif_app1(6, make="AcmeCam"))
    df = spark.createDataFrame(
        [("up", plain), ("rot", rot)], "image_id string, bytes binary"
    )
    meta = {r["image_id"]: r for r in exif_df(df).collect()}
    assert meta["up"]["exif_orientation"] == 1
    assert meta["rot"]["exif_orientation"] == 6
    assert meta["rot"]["exif_make"] == "AcmeCam"

    dec = {r["image_id"]: r
           for r in decode_images_df(df, auto_orient=True).collect()}
    stored = decode_image(plain)
    # orientation 6: stored HxW decodes to upright WxH
    assert (dec["up"]["dec_h"], dec["up"]["dec_w"]) == (8, 6)
    assert (dec["rot"]["dec_h"], dec["rot"]["dec_w"]) == (6, 8)
    up_px = np.array(dec["rot"]["pixels"], dtype=np.uint8).reshape(6, 8, 3)
    assert np.array_equal(up_px, apply_orientation(stored, 6))
    # default path is unchanged (stored orientation preserved)
    dec0 = {r["image_id"]: r for r in decode_images_df(df).collect()}
    assert (dec0["rot"]["dec_h"], dec0["rot"]["dec_w"]) == (8, 6)


def test_exif_df_null_bytes_defaults(spark):
    df = spark.createDataFrame(
        [("ok", encode_jpeg(_grad())), ("missing", None)],
        "image_id string, bytes binary",
    )
    got = {r["image_id"]: r for r in exif_df(df).collect()}
    assert got["missing"]["exif_orientation"] == 1
    assert got["missing"]["exif_make"] is None
    assert got["ok"]["exif_orientation"] == 1
