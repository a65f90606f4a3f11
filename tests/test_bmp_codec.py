"""BMP codec (sources/bmp.py) — exact format, so every assertion is exact
pixel equality, cross-checked against JVM javax.imageio both directions."""

import numpy as np
import pytest

from incubator_sedona_spark.sources import bmp as BM
from incubator_sedona_spark.sources import images as IM


def _pix(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def _jvm_read(spark, buf):
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(buf))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    rgb = jvm.java.awt.image.BufferedImage(bi.getWidth(), bi.getHeight(), 1)
    rgb.createGraphics().drawImage(bi, 0, 0, None)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(rgb, "png", baos)
    return IM.decode_png(bytes(baos.toByteArray()))


def _jvm_write_bmp(spark, pix):
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(IM.encode_png(pix)))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "bmp", baos)
    return bytes(baos.toByteArray())


def test_roundtrip_and_padding():
    for w in (7, 8, 9, 10):  # exercise every 4-byte row-padding phase
        pix = _pix(5, w, seed=w)
        assert np.array_equal(BM.decode_bmp(BM.encode_bmp(pix)), pix)


def test_jvm_both_directions(spark):
    pix = _pix(23, 37, seed=1)
    assert np.array_equal(_jvm_read(spark, BM.encode_bmp(pix)), pix)
    assert np.array_equal(BM.decode_bmp(_jvm_write_bmp(spark, pix)), pix)


def test_decode_image_dispatch():
    pix = _pix(6, 6, seed=2)
    assert np.array_equal(IM.decode_image(BM.encode_bmp(pix)), pix)


def test_top_down_and_32bpp():
    import struct

    pix = _pix(4, 5, seed=3)
    buf = bytearray(BM.encode_bmp(pix))
    # hand-build a top-down 32bpp variant
    h, w = 4, 5
    rows = np.zeros((h, w, 4), np.uint8)
    rows[:, :, :3] = pix[:, :, [2, 1, 0]]
    data = rows.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(data), 0, 0, 0, 0)
    assert np.array_equal(BM.decode_bmp(hdr + info + data), pix)


def test_paletted_8bpp():
    import struct

    pal = np.random.RandomState(4).randint(0, 256, (7, 3), np.uint8)
    idx = np.random.RandomState(5).randint(0, 7, (6, 6)).astype(np.uint8)
    w = h = 6
    row_bytes = (w + 3) & ~3
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, :w] = idx[::-1]  # bottom-up
    pal_bytes = np.zeros((7, 4), np.uint8)
    pal_bytes[:, :3] = pal[:, [2, 1, 0]]
    data = rows.tobytes()
    off = 54 + 7 * 4
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(data), 0, 0, 7, 0)
    out = BM.decode_bmp(hdr + info + pal_bytes.tobytes() + data)
    assert np.array_equal(out, pal[idx])


def test_loud_gates():
    pix = _pix(4, 4)
    buf = bytearray(BM.encode_bmp(pix))
    with pytest.raises(ValueError, match="not a BMP"):
        BM.decode_bmp(b"XX" + bytes(buf[2:]))
    import struct

    bad = bytearray(buf)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        BM.decode_bmp(bytes(bad))
