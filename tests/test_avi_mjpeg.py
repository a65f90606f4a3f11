"""AVI/Motion-JPEG container (sources/avi.py).

The JPEG pixel path is already JVM-cross-checked (test_jpeg_codec.py); what
this file establishes is the CONTAINER: RIFF structure, both idx1 offset
conventions, index-less linear scan, geometry/fps metadata, and — the
scale property — that un-sampled frames are never parsed (proved by
corrupting them and decoding around the damage).
"""

import struct

import numpy as np
import pytest

from incubator_sedona_spark.sources import avi as AV
from incubator_sedona_spark.sources import images as IM
from incubator_sedona_spark.sources.video import decode_video, frame_sample_df, probe_video


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 80 * np.sin(xx / 9.0 + seed) * np.cos(yy / 7.0)
    g = 40 + (xx / max(w - 1, 1)) * 170
    b = 220 - (yy / max(h - 1, 1)) * 180
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _jvm_jpeg(spark, pix):
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(IM.encode_png(pix)))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    return bytes(baos.toByteArray())


@pytest.fixture(scope="module")
def clip(spark):
    frames = [_smooth(48, 64, seed=i) for i in range(6)]
    jpegs = [_jvm_jpeg(spark, f) for f in frames]
    return frames, jpegs


def test_roundtrip_psnr_and_metadata(clip):
    frames, jpegs = clip
    buf = AV.encode_avi_mjpeg(jpegs, 64, 48, fps=12.0)
    meta = AV.parse_avi(buf)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (64, 48, 6)
    assert meta["fps"] == pytest.approx(12.0)
    assert meta["codec"] == "MJPG"
    out = AV.decode_avi(buf)
    assert out.shape == (6, 48, 64, 3)
    for i in range(6):
        assert IM.psnr(out[i], frames[i]) >= 40.0  # JPEG loss only


def test_both_idx1_offset_conventions_and_no_index(clip):
    frames, jpegs = clip
    rel = AV.encode_avi_mjpeg(jpegs, 64, 48, fps=12.0)
    absolute = AV.encode_avi_mjpeg(jpegs, 64, 48, fps=12.0, absolute_index_offsets=True)
    noidx = AV.encode_avi_mjpeg(jpegs, 64, 48, fps=12.0, write_index=False)
    a, b, c = AV.decode_avi(rel), AV.decode_avi(absolute), AV.decode_avi(noidx)
    assert np.array_equal(a, b) and np.array_equal(a, c)


def test_unsampled_frames_never_parsed(clip):
    """Corrupt the JPEG payloads of frames 1, 3, 5 in place: decoding the
    even frames must still work (proof of O(sampled) random access), and
    touching a corrupted frame must fail loud."""
    frames, jpegs = clip
    buf = bytearray(AV.encode_avi_mjpeg(jpegs, 64, 48, fps=12.0))
    meta = AV.parse_avi(bytes(buf))
    for i in (1, 3, 5):
        off, size = meta["frames"][i]
        buf[off : off + size] = b"\x00" * size
    ok = AV.decode_avi(bytes(buf), [0, 2, 4])
    for k, i in enumerate([0, 2, 4]):
        assert IM.psnr(ok[k], frames[i]) >= 40.0
    with pytest.raises(Exception):
        AV.decode_avi(bytes(buf), [3])


def test_decode_video_dispatch_and_probe(clip):
    frames, jpegs = clip
    buf = AV.encode_avi_mjpeg(jpegs, 64, 48, fps=12.0)
    assert probe_video(buf)["n_frames"] == 6
    out = decode_video(buf, [0, 5])
    assert out.shape == (2, 48, 64, 3)
    assert IM.psnr(out[1], frames[5]) >= 40.0


def test_frame_sample_df_over_avi(spark, clip):
    """The every-k sampler works unchanged over AVI bytes (one mapInPandas,
    only sampled frames decoded)."""
    import pandas as pd

    frames, jpegs = clip
    buf = AV.encode_avi_mjpeg(jpegs, 64, 48, fps=12.0)
    df = spark.createDataFrame(pd.DataFrame({"video_id": [7], "bytes": [buf]}))
    got = frame_sample_df(df, every_k=3).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in got] == [0, 3]
    assert got[0]["t_s"] == pytest.approx(0.0)
    assert got[1]["t_s"] == pytest.approx(0.25)
    sampled = IM.decode_png(bytes(got[1]["png"]))
    assert IM.psnr(sampled, frames[3]) >= 40.0


def test_non_mjpeg_codec_fails_loud(clip):
    frames, jpegs = clip
    buf = bytearray(AV.encode_avi_mjpeg(jpegs, 64, 48))
    i = buf.find(b"MJPG")
    while i != -1:  # strh handler + strf biCompression
        buf[i : i + 4] = b"H264"
        i = buf.find(b"MJPG", i + 4)
    with pytest.raises(NotImplementedError, match="H264"):
        AV.decode_avi(bytes(buf))


def test_corrupt_container_fails_loud():
    with pytest.raises(ValueError, match="not an AVI"):
        AV.parse_avi(b"RIFF\x10\x00\x00\x00WAVEdata")
    with pytest.raises(ValueError):
        AV.parse_avi(b"RIFF\x04\x00\x00\x00AVI ")  # no hdrl


def test_geometry_mismatch_fails_loud(spark, clip):
    frames, jpegs = clip
    buf = AV.encode_avi_mjpeg(jpegs, 32, 32, fps=12.0)  # header lies
    with pytest.raises(ValueError, match="header says"):
        AV.decode_avi(buf, [0])


def test_animated_gif_as_video(spark):
    """Animated GIFs are a video modality in web corpora: probe_video /
    decode_video / frame_sample_df all take them (compositing replay is
    the format's own random-access limit, documented)."""
    import pandas as pd

    from incubator_sedona_spark.sources import gif as GF

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (9, 3), dtype=np.uint8)
    frames = [pal[rng.randint(0, 9, (20, 30))] for _ in range(6)]
    buf = GF.encode_gif(frames, delays_cs=[20] * 6)  # 5 fps
    meta = probe_video(buf)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (30, 20, 6)
    assert meta["fps"] == pytest.approx(5.0)
    out = decode_video(buf, [0, 4])
    assert np.array_equal(out[0], frames[0])
    assert np.array_equal(out[1], frames[4])
    df = spark.createDataFrame(pd.DataFrame({"video_id": [1], "bytes": [buf]}))
    got = frame_sample_df(df, every_k=4).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in got] == [0, 4]
    assert got[1]["t_s"] == pytest.approx(0.8)
    assert np.array_equal(IM.decode_png(bytes(got[1]["png"])), frames[4])


def test_avi1_frames_without_dht_decode(spark, clip):
    """Hardware-MJPEG ('AVI1'/OpenDML) frames omit Huffman tables; the
    decoder must supply the T.81 Annex K standard set.  Cross-check: the
    JVM's JPEG writer emits exactly those tables, so stripping its DHT and
    splicing ours back must decode BIT-IDENTICALLY."""
    import numpy as np

    from incubator_sedona_spark.sources.jpeg import decode_jpeg

    frames, jpegs = clip

    def strip_dht(jpeg):
        out = bytearray(jpeg[:2])
        i = 2
        while i + 4 <= len(jpeg) and jpeg[i] == 0xFF:
            m = jpeg[i + 1]
            if m == 0xDA:
                out += jpeg[i:]
                break
            seg = jpeg[i : i + 2 + struct.unpack_from(">H", jpeg, i + 2)[0]]
            if m != 0xC4:
                out += seg
            i += len(seg)
        return bytes(out)

    nodht = [strip_dht(j) for j in jpegs]
    assert all(b"\xff\xc4" not in n[:200] for n in nodht)
    for j, n in zip(jpegs, nodht):
        assert np.array_equal(decode_jpeg(j), decode_jpeg(AV.ensure_dht(n)))
        assert AV.ensure_dht(j) == j  # frames with tables pass through
    # end to end: an AVI of table-less frames decodes
    buf = AV.encode_avi_mjpeg(nodht, 64, 48, fps=12.0)
    out = AV.decode_avi(buf)
    for i in range(len(frames)):
        assert IM.psnr(out[i], frames[i]) >= 40.0


def test_idx1_indexing_only_other_streams_falls_back_to_movi(clip):
    """An idx1 whose entries all belong to another stream (e.g. audio-only
    indexes from some muxers) must not yield zero frames — the movi LIST
    is the ground truth."""
    frames, jpegs = clip
    buf = bytearray(AV.encode_avi_mjpeg(jpegs, 64, 48, fps=12.0))
    # rewrite every idx1 entry's chunk id to stream 01 audio ('01wb')
    idx = bytes(buf).rfind(b"idx1")
    size = struct.unpack_from("<I", buf, idx + 4)[0]
    for off in range(idx + 8, idx + 8 + size, 16):
        buf[off : off + 4] = b"01wb"
    meta = AV.parse_avi(bytes(buf))
    assert meta["n_frames"] == 6  # movi fallback found the video chunks
    out = AV.decode_avi(bytes(buf), [2])
    assert IM.psnr(out[0], frames[2]) >= 40.0


def test_rawv_dispatch_regression():
    """decode_video must keep decoding RAWV (regression: the GIF branch
    once swallowed the RAWV dispatch line)."""
    from incubator_sedona_spark.sources.video import encode_rawv, gen_video

    buf = gen_video(3)
    out = decode_video(buf, [0, 2])
    assert out.shape[0] == 2
    assert probe_video(buf)["n_frames"] == 12


def test_gif_max_frames_early_stop():
    from incubator_sedona_spark.sources import gif as GF

    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (5, 3), dtype=np.uint8)
    frames = [pal[rng.randint(0, 5, (8, 8))] for _ in range(10)]
    buf = GF.encode_gif(frames, delays_cs=[5] * 10)
    part = GF.decode_gif_frames(buf, max_frames=3)
    assert len(part) == 3
    full = GF.decode_gif_frames(buf)
    for (d1, f1), (d2, f2) in zip(part, full[:3]):
        assert d1 == d2 and np.array_equal(f1, f2)
    # decode_video path requests only up to the max wanted index
    out = decode_video(buf, [0, 2])
    assert np.array_equal(out[1], frames[2])
