"""Verify the pure-numpy baseline JPEG ENCODER (sources/jpeg_encode.py)
against two independent decoders: our own (sources/jpeg.py, itself
JVM-cross-checked) and JVM javax.imageio reading OUR bytes — the same
both-directions strategy as the PNG/GIF/TIFF codecs."""

import numpy as np
import pytest

from incubator_sedona_spark.sources import images as IM
from incubator_sedona_spark.sources.jpeg import decode_jpeg
from incubator_sedona_spark.sources.jpeg_encode import (
    _build_codes,
    _quality_scaled,
    AC_LUMA,
    DC_LUMA,
    QUANT_LUMA,
    encode_jpeg,
)


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 80 * np.sin(xx / 9.0 + seed) * np.cos(yy / 7.0)
    g = 40 + (xx / max(w - 1, 1)) * 170
    b = 220 - (yy / max(h - 1, 1)) * 180
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _jvm_decode(spark, jpeg: bytes) -> np.ndarray:
    """JVM ImageIO decode of OUR jpeg bytes, returned exactly via PNG."""
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(jpeg))
    dec = jvm.javax.imageio.ImageIO.read(bais)
    assert dec is not None, "JVM ImageIO rejected our stream"
    rgb = jvm.java.awt.image.BufferedImage(dec.getWidth(), dec.getHeight(), 1)
    rgb.getGraphics().drawImage(dec, 0, 0, None)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(rgb, "png", baos)
    return IM.decode_png(bytes(baos.toByteArray()))


@pytest.mark.parametrize("subsampling", ["4:2:0", "4:4:4"])
def test_jvm_decodes_our_stream(spark, subsampling):
    pix = _smooth(48, 64)
    jpeg = encode_jpeg(pix, quality=90, subsampling=subsampling)
    jvm_pix = _jvm_decode(spark, jpeg)
    assert jvm_pix.shape == (48, 64, 3)
    # encoder loss vs the source
    assert IM.psnr(jvm_pix, pix) >= 35.0
    # decoder-vs-decoder on OUR bytes: both read the same coefficients
    ours = decode_jpeg(jpeg)
    assert IM.psnr(ours, jvm_pix) >= 40.0


def test_jvm_decodes_grayscale_and_odd_sizes(spark):
    gr = _smooth(37, 23)[:, :, 1]
    jpeg = encode_jpeg(gr, quality=90)
    jvm_pix = _jvm_decode(spark, jpeg)
    assert jvm_pix.shape == (37, 23, 3)
    assert IM.psnr(jvm_pix[:, :, 0], gr) >= 35.0
    pix = _smooth(21, 45, seed=3)
    jvm_pix = _jvm_decode(spark, encode_jpeg(pix, quality=90))
    assert jvm_pix.shape == (21, 45, 3)
    assert IM.psnr(jvm_pix, pix) >= 34.0


def test_own_decoder_roundtrip_quality_ladder():
    pix = _smooth(64, 80, seed=1)
    prev_size = 0
    prev_psnr = 0.0
    for q in (30, 60, 85, 95):
        jpeg = encode_jpeg(pix, quality=q)
        dec = decode_jpeg(jpeg)
        p = IM.psnr(dec, pix)
        assert p >= prev_psnr - 0.5, (q, p, prev_psnr)  # quality ladder rises
        assert len(jpeg) > prev_size * 0.9
        prev_psnr, prev_size = p, len(jpeg)
    assert prev_psnr >= 40.0  # q=95 on smooth content


def test_flat_image_is_tiny_and_exactish():
    pix = np.full((32, 32, 3), 200, np.uint8)
    jpeg = encode_jpeg(pix, quality=85)
    assert len(jpeg) < 1200  # DC-only blocks: a few bits each
    dec = decode_jpeg(jpeg)
    assert int(np.abs(dec.astype(int) - 200).max()) <= 2


def test_edge_shapes_and_validation():
    one = np.full((1, 1, 3), 77, np.uint8)
    assert decode_jpeg(encode_jpeg(one))[0, 0].tolist() == [76, 76, 76]
    eight = _smooth(8, 8)
    assert decode_jpeg(encode_jpeg(eight, quality=95)).shape == (8, 8, 3)
    with pytest.raises(ValueError):
        encode_jpeg(one.astype(np.int32))
    with pytest.raises(ValueError):
        encode_jpeg(one, quality=0)
    with pytest.raises(ValueError):
        encode_jpeg(one, subsampling="4:2:2")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))


def test_quality_scaling_formula():
    # 50 keeps Annex K verbatim; 100 is all-ones; low quality clamps at 255
    assert (_quality_scaled(QUANT_LUMA, 50) == QUANT_LUMA).all()
    assert (_quality_scaled(QUANT_LUMA, 100) == 1).all()
    assert _quality_scaled(QUANT_LUMA, 1).max() == 255
    assert _quality_scaled(QUANT_LUMA, 1).min() >= 1


def test_huffman_code_assignment_is_prefix_free():
    for counts, vals in (DC_LUMA, AC_LUMA):
        codes = _build_codes(counts, vals)
        assert len(codes) == len(vals)
        items = sorted(codes.values(), key=lambda cl: (cl[1], cl[0]))
        seen = []
        for code, length in items:
            for pcode, plen in seen:
                assert not (length >= plen and (code >> (length - plen)) == pcode)
            seen.append((code, length))


def test_resize_df_jpeg_sink(spark):
    """The fused decode->resize->encode stage emits real JPEG thumbnails."""
    pix = _smooth(40, 56, seed=2)
    df = spark.createDataFrame(
        [(1, bytearray(IM.encode_png(pix)), 56, 40, "png")],
        "image_id long, bytes binary, w int, h int, fmt string",
    )
    out = IM.resize_images_df(
        df, 28, 20, crop=None, out_fmt="jpeg", jpeg_quality=90
    ).collect()
    assert out[0]["fmt"] == "jpeg" and out[0]["w"] == 28 and out[0]["h"] == 20
    buf = bytes(out[0]["bytes"])
    assert buf[:2] == b"\xff\xd8"
    dec = decode_jpeg(buf)
    ref = IM.resize_pixels(pix, 20, 28, "bilinear")
    assert IM.psnr(dec, ref) >= 33.0
    with pytest.raises(ValueError):
        IM.resize_images_df(df, 28, 20, out_fmt="webp")
