"""Cross-check the pure-numpy GIF codec against the JVM's javax.imageio on
the SAME bytes (the PNG/JPEG codec verification strategy).  GIF is lossless
given a palette, so every assertion here is EXACT equality, not PSNR.

Both directions are exercised:
  * our encode_gif -> ImageIO.read          (encoder verified by foreign decoder)
  * ImageIO.write("gif") -> our decode_gif  (decoder verified on foreign bytes)
Bulk byte transfer via PNG both ways; no per-pixel py4j calls.
"""

import numpy as np
import pytest

from incubator_sedona_spark.sources import gif as GF
from incubator_sedona_spark.sources import images as IM


def _paletted(h, w, ncolors=13, seed=0):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.randint(0, ncolors, (h, w))]


def _jvm_read_to_pixels(spark, buf: bytes) -> np.ndarray:
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(buf))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    rgb = jvm.java.awt.image.BufferedImage(bi.getWidth(), bi.getHeight(), 1)
    rgb.createGraphics().drawImage(bi, 0, 0, None)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(rgb, "png", baos)
    return IM.decode_png(bytes(baos.toByteArray()))


def _jvm_write_gif(spark, pix: np.ndarray) -> bytes:
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(IM.encode_png(pix)))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    return bytes(baos.toByteArray())


def test_our_encoder_read_by_jvm(spark):
    pix = _paletted(37, 53)
    got = _jvm_read_to_pixels(spark, GF.encode_gif(pix))
    assert np.array_equal(got, pix)


def test_our_interlaced_encoder_read_by_jvm(spark):
    pix = _paletted(41, 29, ncolors=7, seed=3)
    got = _jvm_read_to_pixels(spark, GF.encode_gif(pix, interlace=True))
    assert np.array_equal(got, pix)


def test_jvm_writer_read_by_our_decoder(spark):
    """Foreign bytes: the JVM's GIF writer (its own LZW, its own palette
    layout, its own sub-block sizes) must decode exactly."""
    for seed, (h, w) in [(0, (37, 53)), (1, (64, 64)), (2, (17, 251))]:
        pix = _paletted(h, w, ncolors=200, seed=seed)
        buf = _jvm_write_gif(spark, pix)
        ours = GF.decode_gif(buf)
        theirs = _jvm_read_to_pixels(spark, buf)
        assert np.array_equal(ours, theirs)
        assert np.array_equal(ours, pix)  # lossless end to end


def test_jvm_gradient_wide_codes(spark):
    """256 colors forces the full code-width ladder (9..12 bit codes)."""
    g = np.repeat(np.arange(256, dtype=np.uint8)[None, :, None], 96, axis=0)
    pix = np.repeat(g, 3, axis=2)
    buf = _jvm_write_gif(spark, pix)
    assert np.array_equal(GF.decode_gif(buf), pix)
    assert np.array_equal(_jvm_read_to_pixels(spark, GF.encode_gif(pix)), pix)


def test_decode_image_dispatch():
    pix = _paletted(16, 16)
    buf = GF.encode_gif(pix)
    assert np.array_equal(IM.decode_image(buf), pix)


def test_animation_compositing():
    """Multi-frame: disposal=1 (leave) composes each frame onto the last."""
    f1 = _paletted(20, 20, seed=5)
    f2 = f1.copy()
    f2[5:10, 5:10] = [255, 0, 0]
    buf = GF.encode_gif([f1, f2], delays_cs=[10, 20])
    frames = GF.decode_gif_frames(buf)
    assert [d for d, _ in frames] == [10, 20]
    assert np.array_equal(frames[0][1], f1)
    assert np.array_equal(frames[1][1], f2)


def test_transparency_and_disposal_spec_anchored():
    """Hand-built GIF89a stream (spec section 23): frame 2 paints a 2x2
    sub-rectangle with one transparent index; the transparent pixel must
    show frame 1's pixel through."""
    import struct

    pal = np.array([[10, 20, 30], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8)
    base = np.zeros((4, 4), np.uint8)  # index 0 everywhere
    overlay = np.array([[1, 3], [3, 2]], np.uint8)  # 3 = transparent
    out = bytearray(b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0x81, 0, 0]))
    out += pal.tobytes()

    def img_block(idx, left, top, w, h):
        blk = bytearray(b"\x2c" + struct.pack("<HHHH", left, top, w, h) + b"\x00")
        lzw = GF._lzw_encode(idx.ravel().astype(np.int32), 2)
        blk += bytes([2, len(lzw)]) + lzw + b"\x00"
        return blk

    out += img_block(base, 0, 0, 4, 4)
    # GCE: disposal=1, transparency on, transparent index 3
    out += b"\x21\xf9\x04" + bytes([0x05]) + struct.pack("<H", 7) + bytes([3, 0])
    out += img_block(overlay, 1, 1, 2, 2)
    out += b"\x3b"
    frames = GF.decode_gif_frames(bytes(out))
    assert len(frames) == 2
    expect = np.broadcast_to(pal[0], (4, 4, 3)).copy()
    assert np.array_equal(frames[0][1], expect)
    expect2 = expect.copy()
    expect2[1, 1] = pal[1]  # overlay[0,0] = 1
    expect2[2, 2] = pal[2]  # overlay[1,1] = 2; indices 3 stay transparent
    assert frames[1][0] == 7
    assert np.array_equal(frames[1][1], expect2)


def test_corrupt_inputs_fail_loud():
    pix = _paletted(8, 8)
    buf = bytearray(GF.encode_gif(pix))
    with pytest.raises(ValueError, match="not a GIF"):
        GF.decode_gif(b"NOTAGIF" + bytes(buf[7:]))
    with pytest.raises(ValueError):
        GF.decode_gif(bytes(buf[: len(buf) // 2]))  # truncated mid-stream


# -- property fuzz -----------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ncolors=st.integers(1, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_fuzz(h, w, ncolors, interlace, seed):
    """Any palette size x any geometry x interlace: encode->decode is the
    identity (GIF is lossless given a palette)."""
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    pix = pal[rng.randint(0, ncolors, (h, w))]
    assert np.array_equal(GF.decode_gif(GF.encode_gif(pix, interlace=interlace)), pix)
