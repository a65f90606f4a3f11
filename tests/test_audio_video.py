"""Audio (real WAV codec) and video (RAWV container) modality tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.sources import audio as A
from incubator_sedona_spark.sources import video as V


def test_wav_roundtrip_mono_and_stereo():
    mono = (np.sin(np.linspace(0, 20, 800)) * 10000).astype(np.int16)
    s, sr = A.decode_wav(A.encode_wav(mono, 8000))
    assert sr == 8000 and s.shape == (800, 1)
    assert np.array_equal(s[:, 0], mono)

    stereo = np.stack([mono, -mono], axis=1)
    s2, sr2 = A.decode_wav(A.encode_wav(stereo, 44100))
    assert sr2 == 44100 and s2.shape == (800, 2)
    assert np.array_equal(s2, stereo)


def test_wav_skips_extra_chunks_and_gates_compressed():
    wav = bytearray(A.encode_wav(np.zeros(10, np.int16), 8000))
    # inject a LIST chunk between fmt and data (common in real files)
    import struct

    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = bytes(wav[:fmt_end]) + extra + bytes(wav[fmt_end:])
    s, sr = A.decode_wav(patched)
    assert s.shape == (10, 1) and sr == 8000
    with pytest.raises(NotImplementedError):
        A.decode_wav(b"\xffID3not-a-riff-stream")


def test_audio_features_deterministic():
    buf = A.gen_audio(7)
    s, sr = A.decode_wav(buf)
    f = A.audio_features(s, sr)
    assert f["duration_s"] == pytest.approx(1.0)
    assert 0 < f["rms"] < 32768 and 0 < f["zcr"] < 1
    assert len(f["window_rms"]) == 8
    assert A.audio_features(*A.decode_wav(A.gen_audio(7))) == f


def test_audio_features_df(spark):
    rows = [(i, bytearray(A.gen_audio(i))) for i in range(6)]
    df = spark.createDataFrame(rows, "clip_id long, bytes binary")
    out = A.audio_features_df(df)
    got = out.select("clip_id", "sample_rate", "duration_s", "rms", "zcr").collect()
    assert len(got) == 6
    assert all(r.sample_rate == 8000 and abs(r.duration_s - 1.0) < 1e-9 for r in got)
    # clip 0 vs clip 1: different fundamental -> different zcr
    by_id = {r.clip_id: r.zcr for r in got}
    assert by_id[0] != by_id[1]


def test_audio_windows_df(spark):
    rows = [(1, bytearray(A.gen_audio(1, seconds=1.0)))]
    df = spark.createDataFrame(rows, "clip_id long, bytes binary")
    wins = A.audio_windows_df(df, window_s=0.25).collect()
    assert [r.window_idx for r in wins] == [0, 1, 2, 3]
    assert [r.t0_s for r in wins] == [0.0, 0.25, 0.5, 0.75]
    # each window is a standalone decodable WAV of 2000 samples
    s, sr = A.decode_wav(bytes(wins[2].wav))
    assert sr == 8000 and s.shape[0] == 2000
    full, _ = A.decode_wav(bytes(rows[0][1]))
    assert np.array_equal(s[:, 0], full[4000:6000, 0])


def test_rawv_roundtrip_and_random_access():
    buf = V.gen_video(3, n_frames=10)
    meta = V.probe_rawv(buf)
    assert meta == {"width": 32, "height": 24, "fps": 6.0, "n_frames": 10}
    allf = V.decode_video(buf)
    assert allf.shape == (10, 24, 32, 3)
    some = V.decode_video(buf, [0, 7])
    assert np.array_equal(some[0], allf[0]) and np.array_equal(some[1], allf[7])
    with pytest.raises(NotImplementedError):
        V.decode_video(b"\x00\x00\x00\x20ftypisom-fake-mp4")


def test_frame_sample_df(spark):
    from incubator_sedona_spark.sources.images import decode_png

    rows = [(i, bytearray(V.gen_video(i, n_frames=12))) for i in range(3)]
    df = spark.createDataFrame(rows, "video_id long, bytes binary")
    out = V.frame_sample_df(df, every_k=4).collect()
    assert len(out) == 9  # 3 videos x frames {0, 4, 8}
    r0 = [r for r in out if r.video_id == 0 and r.frame_idx == 4][0]
    assert r0.t_s == pytest.approx(4 / 6.0)
    # the emitted PNG decodes back to the exact frame
    frame = V.decode_video(bytes(rows[0][1]), [4])[0]
    assert np.array_equal(decode_png(bytes(r0.png)), frame)
    assert r0.mean_r == pytest.approx(float(frame[:, :, 0].mean()))


def test_scene_cuts_planted(spark):
    """A video with two planted hard cuts: constant gray scenes at 3
    brightness levels.  Cuts land exactly at the scene boundaries; a clip
    whose brightness drifts +2/frame (smooth fade) yields no cuts at the
    same threshold."""
    import numpy as np

    from incubator_sedona_spark.sources.video import encode_rawv, scene_cuts_df

    h, w = 16, 20
    scene = lambda lvl, n: np.full((n, h, w, 3), lvl, dtype=np.uint8)
    frames = np.concatenate([scene(20, 4), scene(120, 3), scene(230, 5)])
    cutty = encode_rawv(frames, 8.0)
    smooth = encode_rawv(
        np.stack([np.full((h, w, 3), 40 + 2 * i, dtype=np.uint8)
                  for i in range(12)]),
        8.0,
    )
    df = spark.createDataFrame(
        [(1, bytearray(cutty)), (2, bytearray(smooth))],
        "video_id long, bytes binary",
    )
    got = {r["video_id"]: r for r in scene_cuts_df(df, threshold=30.0).collect()}
    assert got[1]["cut_indices"] == [4, 7]
    assert got[1]["n_frames"] == 12 and got[1]["n_compared"] == 12
    assert got[1]["max_diff"] == pytest.approx(110.0)  # 230-120
    assert got[2]["cut_indices"] == []
    # bytes column is dropped from the output (frames never re-cross Arrow)
    assert "bytes" not in got[1].asDict()


def test_scene_cuts_step_and_downsample(spark):
    """step=2 compares every other frame (cut indices reported in ORIGINAL
    frame numbers); downsample keeps constant-scene diffs exact."""
    import numpy as np

    from incubator_sedona_spark.sources.video import encode_rawv, scene_cuts_df

    scene = lambda lvl, n: np.full((n, 8, 8, 3), lvl, dtype=np.uint8)
    buf = encode_rawv(np.concatenate([scene(10, 4), scene(200, 4)]), 4.0)
    df = spark.createDataFrame([(1, bytearray(buf))], "video_id long, bytes binary")
    got = scene_cuts_df(df, threshold=30.0, step=2, downsample=2).first()
    assert got["n_compared"] == 4
    assert got["cut_indices"] == [4]
    assert got["max_diff"] == pytest.approx(190.0)
    # single-frame video: no comparisons, NULL diffs
    one = spark.createDataFrame(
        [(9, bytearray(encode_rawv(scene(50, 1), 4.0)))],
        "video_id long, bytes binary",
    )
    r1 = scene_cuts_df(one).first()
    assert r1["cut_indices"] == [] and r1["max_diff"] is None
    with pytest.raises(ValueError, match="step"):
        scene_cuts_df(df, step=0)
