"""FLAC codec tests: bit-exact round-trips + SPEC-ANCHORED goldens.

The container has no libFLAC/ffmpeg/soundfile, so decoder-vs-encoder
round-trips alone could hide a correlated misreading of the spec.  The
goldens below break that circularity:
- the CRC-8 (0x07) and CRC-16 (0x8005) implementations are pinned to the
  published check values for "123456789",
- a complete frame is HAND-ASSEMBLED from the RFC 9639 bit layout (sync,
  header codes, constant subframe, CRCs) and must decode without the
  encoder being involved.
"""

import hashlib
import struct

import numpy as np
import pytest

from incubator_sedona_spark.sources.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def test_crc_check_values():
    # published check values: CRC-8/SMBUS = 0xF4, CRC-16/UMTS (BUYPASS) = 0xFEE8
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def _hand_built_stream(value=100, n=192):
    """A full FLAC stream assembled bit-by-bit from the spec, no encoder."""
    pcm = np.full(n, value, dtype="<i2")
    md5 = hashlib.md5(pcm.tobytes()).digest()
    si = struct.pack(">HH", n, n) + b"\x00" * 6
    sr = 8000
    si += bytes([sr >> 12, (sr >> 4) & 0xFF])
    si += bytes([((sr & 0xF) << 4) | (0 << 1) | 0])  # 1 channel, bps-1 high bit 0
    si += bytes([(15 << 4) | 0])  # bps-1 = 15 low nibble, total high nibble
    si += struct.pack(">I", n)
    si += md5
    head = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(si))[1:] + si
    # frame header: sync(15)=0b111111111111100 + blocking(1)=0 -> FF F8;
    # bs_code=1 (192) | sr_code=0 -> 0x10; ch=0, ss=4 (16-bit) -> 0x08; frame#0
    hdr = bytes([0xFF, 0xF8, 0x10, 0x08, 0x00])
    hdr += bytes([_crc8(hdr)])
    # subframe: pad(1)=0, type(6)=000000 CONSTANT, wasted(1)=0 -> 0x00;
    # then one 16-bit sample
    frame = hdr + bytes([0x00]) + struct.pack(">h", value)
    frame += struct.pack(">H", _crc16(frame))
    return head + frame, pcm


def test_hand_built_constant_frame_decodes():
    stream, pcm = _hand_built_stream()
    out, sr, bps = decode_flac(stream)
    assert sr == 8000 and bps == 16
    assert np.array_equal(out[:, 0], pcm)


def test_hand_built_stream_detects_bit_corruption():
    stream, _ = _hand_built_stream()
    bad = bytearray(stream)
    bad[-4] ^= 0x01  # flip a bit in the constant sample
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))


def test_roundtrip_mono_smooth():
    t = np.arange(9000)
    mono = (8000 * np.sin(t / 40.0) + 2000 * np.sin(t / 7.0)).astype(np.int64)
    out, sr, bps = decode_flac(encode_flac(mono, 8000))
    assert (sr, bps) == (8000, 16)
    assert np.array_equal(out[:, 0], mono)


def test_roundtrip_stereo_left_side():
    rng = np.random.RandomState(42)
    t = np.arange(9000)
    left = (8000 * np.sin(t / 40.0)).astype(np.int64)
    right = left + rng.randint(-50, 50, size=len(left))
    st = np.stack([left, right], axis=1)
    out, _, _ = decode_flac(encode_flac(st, 44100))
    assert np.array_equal(out, st)


def test_roundtrip_noise_and_extremes():
    rng = np.random.RandomState(7)
    noise = rng.randint(-30000, 30000, size=5000)
    assert np.array_equal(decode_flac(encode_flac(noise, 16000))[0][:, 0], noise)
    edge = np.array([32767, -32768, 0, -1, 1] * 100)
    assert np.array_equal(decode_flac(encode_flac(edge, 16000))[0][:, 0], edge)


def test_roundtrip_8_and_24_bit():
    rng = np.random.RandomState(9)
    b24 = rng.randint(-(1 << 23), 1 << 23, size=3000)
    out, _, bps = decode_flac(encode_flac(b24, 48000, bps=24))
    assert bps == 24 and np.array_equal(out[:, 0], b24)
    b8 = rng.randint(-128, 128, size=3000)
    out, _, bps = decode_flac(encode_flac(b8, 8000, bps=8))
    assert bps == 8 and np.array_equal(out[:, 0], b8)


def test_multiframe_utf8_frame_numbers():
    # >128 frames exercises the multi-byte UTF-8 coded frame number
    rng = np.random.RandomState(3)
    long = rng.randint(-1000, 1000, size=256 * 140 + 17)
    assert np.array_equal(
        decode_flac(encode_flac(long, 8000, block=256))[0][:, 0], long
    )


def test_flac_vs_wav_twin_bit_exact():
    """The BASELINE 'exact oracle' property: FLAC is lossless, so decoding
    the FLAC encoding of a WAV's samples must equal decoding the WAV."""
    from incubator_sedona_spark.sources.audio import decode_wav, encode_wav, gen_audio

    wav = gen_audio(17)
    samples, sr = decode_wav(wav)
    flac = encode_flac(samples[:, 0], sr)
    out, sr2, _ = decode_flac(flac)
    assert sr2 == sr
    assert np.array_equal(out[:, 0], samples[:, 0])


def test_decode_wav_accepts_flac():
    from incubator_sedona_spark.sources.audio import decode_wav

    t = np.arange(4000)
    mono = (5000 * np.sin(t / 25.0)).astype(np.int64)
    samples, sr = decode_wav(encode_flac(mono, 8000))
    assert sr == 8000
    assert np.array_equal(samples[:, 0], mono)


def test_featurize_pipeline_consumes_flac(spark):
    """audio_features_df over a mixed WAV/FLAC corpus: features from the
    FLAC twin must be IDENTICAL (lossless) to the WAV's."""
    from incubator_sedona_spark.sources.audio import (
        audio_features_df,
        decode_wav,
        gen_audio,
    )

    rows = []
    for cid in range(6):
        wav = gen_audio(cid)
        samples, sr = decode_wav(wav)
        rows.append((f"w{cid}", bytearray(wav)))
        rows.append((f"f{cid}", bytearray(encode_flac(samples[:, 0], sr))))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    feats = {r["clip_id"]: r for r in audio_features_df(df).collect()}
    for cid in range(6):
        w, f = feats[f"w{cid}"], feats[f"f{cid}"]
        assert w["rms"] == pytest.approx(f["rms"], abs=0.0)
        assert w["n_samples"] == f["n_samples"]
