"""Pure-Python/numpy FLAC codec — no libFLAC/soundfile needed.

Implements the public xiph.org FLAC format (RFC 9639):

- decoder: STREAMINFO parse, frame sync + header (block size / sample rate /
  channel assignment / sample size codes, UTF-8-coded frame number, CRC-8
  verified), subframe types CONSTANT / VERBATIM / FIXED (orders 0-4) /
  LPC (orders 1-32), partitioned Rice residual (RICE and RICE2, escape
  partitions), wasted bits, stereo decorrelation (left/side, right/side,
  mid/side), frame CRC-16 verified, STREAMINFO MD5 verified against the
  decoded stream.  Lossless, so decode is BIT-EXACT by construction and
  every checksum is an independent witness.
- encoder: 8/16/24-bit PCM, 1-2 channels, per-frame best-of fixed
  predictor (orders 0-2) + single-partition Rice, optional left/side
  decorrelation; emits the STREAMINFO MD5 so any decoder can verify.

This is the audio-decode stage the reference reaches through external
codec libraries; the WAV/PCM codec in sources/audio.py is the uncompressed
twin (the engine's audio featurize/window operators consume either).
Tests round-trip deterministic PCM bit-exactly and pin hand-computed
byte-level goldens from the spec so the encoder and decoder cannot share a
correlated misreading silently.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
                7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header checksum."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — the frame checksum."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over a bytes buffer (bit-array backed: unary
    runs resolve with one argmax over the 0/1 array, not per-bit calls)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        rel = int(np.argmax(self.bits[self.pos :]))
        if self.bits[self.pos + rel] != 1:
            raise ValueError("FLAC: ran off the end inside a unary code")
        self.pos += rel + 1
        return rel

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(r: _BitReader) -> int:
    """The frame header's UTF-8-style coded frame/sample number."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (r.read(8) & 0x3F)
    return v


def _read_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = r.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("FLAC: partition order does not divide block size")
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            raw = r.read(5)
            for i in range(n):
                out[w] = r.read_signed(raw) if raw else 0
                w += 1
        else:
            for i in range(n):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out[w] = (u >> 1) ^ -(u & 1)  # zigzag -> signed
                w += 1
    return out


def _predict(warm: np.ndarray, resid: np.ndarray, coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    out = np.empty(len(warm) + len(resid), dtype=np.int64)
    out[:order] = warm
    c = np.array(coefs[::-1], dtype=np.int64)  # oldest-first for the dot
    for i in range(len(resid)):
        pred = int(np.dot(c, out[i : i + order])) >> shift
        out[order + i] = resid[i] + pred
    return out


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC: subframe header pad bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        out = np.full(blocksize, r.read_signed(eff), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([r.read_signed(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        warm = np.array([r.read_signed(eff) for _ in range(order)], dtype=np.int64)
        resid = _read_residual(r, blocksize, order)
        out = _predict(warm, resid, _FIXED_COEF[order], 0)
    elif t >= 32:  # LPC, order (t & 31) + 1
        order = (t & 31) + 1
        warm = np.array([r.read_signed(eff) for _ in range(order)], dtype=np.int64)
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision code 1111")
        shift = r.read_signed(5)
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        out = _predict(warm, resid, coefs, shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {t}")
    return out << wasted if wasted else out


def decode_flac(buf: bytes) -> tuple[np.ndarray, int, int]:
    """Decode FLAC bytes -> (samples int32 (n, channels), sample_rate, bps).

    Verifies every frame's CRC-8/CRC-16 and the stream MD5 from STREAMINFO
    (when non-zero) — a lossless decode has no tolerance, only equality."""
    buf = bytes(buf)
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    i = 4
    info = None
    while True:
        hdr = buf[i]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + buf[i + 1 : i + 4])
        body = buf[i + 4 : i + 4 + blen]
        if btype == 0:  # STREAMINFO
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            nch = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 0x01) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) | struct.unpack(">I", body[14:18])[0]
            info = {"sr": sr, "nch": nch, "bps": bps, "total": total,
                    "md5": body[18:34]}
        i += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")

    channels: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(info["nch"])]
    data = buf[i:]
    r = _BitReader(data)  # frames are byte-aligned: one reader for the stream
    while r.byte_pos() < len(data) - 2:
        pos = r.byte_pos()
        sync = r.read(15)
        if sync != 0b111111111111100:
            raise ValueError("FLAC: lost frame sync")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_FIXED[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        hdr_end = r.byte_pos()
        if _crc8(data[pos:hdr_end]) != r.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        bps = info["bps"] if ss_code == 0 else _SAMPLE_SIZE[ss_code]

        if ch_code < 8:
            nch = ch_code + 1
            subs = [_read_subframe(r, blocksize, bps) for _ in range(nch)]
        else:
            # stereo decorrelation: the SIDE channel carries one extra bit
            side_idx = {8: 1, 9: 0, 10: 1}[ch_code]
            subs = [
                _read_subframe(r, blocksize, bps + (1 if c == side_idx else 0))
                for c in range(2)
            ]
            if ch_code == 8:  # left/side
                subs = [subs[0], subs[0] - subs[1]]
            elif ch_code == 9:  # right/side: ch0 = side, ch1 = right
                subs = [subs[1] + subs[0], subs[1]]
            else:  # mid/side
                mid, side = subs
                mid = (mid << 1) | (side & 1)
                subs = [(mid + side) >> 1, (mid - side) >> 1]
        r.align()
        frame_end = r.byte_pos()
        crc16 = r.read(16)
        if _crc16(data[pos:frame_end]) != crc16:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c, s in enumerate(subs):
            channels[c] = np.concatenate([channels[c], s])
        if info["total"] and len(channels[0]) >= info["total"]:
            break

    out = np.stack(channels, axis=1).astype(np.int64)
    if info["total"]:
        out = out[: info["total"]]
    if info["md5"] != b"\x00" * 16:
        width = (info["bps"] + 7) // 8
        raw = _pcm_bytes(out, info["bps"], width)
        if hashlib.md5(raw).digest() != info["md5"]:
            raise ValueError("FLAC: decoded stream MD5 mismatch")
    return out.astype(np.int32), info["sr"], info["bps"]


def _pcm_bytes(samples: np.ndarray, bps: int, width: int) -> bytes:
    """Interleaved little-endian signed PCM — the stream the MD5 covers."""
    flat = samples.reshape(-1)
    b = np.empty((len(flat), width), dtype=np.uint8)
    v = flat.astype(np.int64)
    for k in range(width):
        b[:, k] = (v >> (8 * k)) & 0xFF
    return b.tobytes()


# -- encoder -------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _best_fixed_order(x: np.ndarray) -> tuple[int, np.ndarray]:
    """(order, residual): the fixed predictor (0-2) minimizing sum |resid|."""
    best_o, best_cost = 0, np.abs(x).sum()
    r = x
    for o in (1, 2):
        if len(x) <= o:
            break
        r = np.diff(r)
        cost = np.abs(r).sum()
        if cost < best_cost:
            best_o, best_cost = o, cost
    resid = x
    for _ in range(best_o):
        resid = np.diff(resid)
    return best_o, resid


def _rice_param(resid: np.ndarray) -> int:
    if not len(resid):
        return 0
    mean = max(float(np.mean(np.abs(resid))), 0.5)
    return min(14, max(0, int(np.ceil(np.log2(mean + 1)))))


def _write_residual(w: _BitWriter, resid: np.ndarray) -> None:
    w.write(0, 2)  # RICE (4-bit params)
    w.write(0, 4)  # partition order 0
    param = _rice_param(resid)
    w.write(param, 4)
    for v in resid:
        u = (int(v) << 1) ^ (int(v) >> 63)  # zigzag
        w.write_unary(u >> param)
        w.write(u, param)


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    if len(x) and np.all(x == x[0]):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    order, resid = _best_fixed_order(x.astype(np.int64))
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for v in x[:order]:
        w.write(int(v), bps)
    _write_residual(w, resid)


def encode_flac(
    samples: np.ndarray, sample_rate: int, bps: int = 16, block: int = 4096,
    stereo_decorrelate: bool = True,
) -> bytes:
    """Encode (n,) or (n, ch) integer PCM to a FLAC stream (fixed
    predictors, single-partition Rice; lossless by construction)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if nch > 2:
        raise ValueError("encode_flac: at most 2 channels")
    lim = 1 << (bps - 1)
    if x.max(initial=0) >= lim or x.min(initial=0) < -lim:
        raise ValueError(f"samples exceed {bps}-bit range")

    width = (bps + 7) // 8
    md5 = hashlib.md5(_pcm_bytes(x, bps, width)).digest()
    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block, block)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si.append((sample_rate >> 12) & 0xFF)
    si.append((sample_rate >> 4) & 0xFF)
    si.append(((sample_rate & 0x0F) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4))
    si.append((((bps - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F))
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += md5
    out.append(0x80)  # last block, STREAMINFO
    out += struct.pack(">I", len(si))[1:]
    out += si

    ss_code = {8: 1, 16: 4, 24: 6}.get(bps)
    if ss_code is None:
        raise ValueError("encode_flac: bps must be 8, 16, or 24")
    for fi, start in enumerate(range(0, n, block)):
        blk = x[start : start + block]
        bs = len(blk)
        w = _BitWriter()
        w.write(0b111111111111100, 15)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # block size: 16-bit at end of header
        w.write(0, 4)  # sample rate: from STREAMINFO
        left_side = False
        if nch == 2 and stereo_decorrelate:
            side = blk[:, 0] - blk[:, 1]
            left_side = np.abs(side).sum() < np.abs(blk[:, 1]).sum()
        w.write(8 if left_side else nch - 1, 4)
        w.write(ss_code, 3)
        w.write(0, 1)
        # UTF-8 coded frame number
        fnum = fi
        if fnum < 0x80:
            w.write(fnum, 8)
        else:
            for nbytes, maxv in ((2, 1 << 11), (3, 1 << 16), (4, 1 << 21),
                                 (5, 1 << 26), (6, 1 << 31)):
                if fnum < maxv:
                    break
            lead = (0xFF << (8 - nbytes)) & 0xFF  # nbytes ones, then a zero
            w.write(lead | (fnum >> (6 * (nbytes - 1))), 8)
            for k in range(nbytes - 2, -1, -1):
                w.write(0x80 | ((fnum >> (6 * k)) & 0x3F), 8)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        w2 = _BitWriter()
        w2.out = bytearray(hdr)
        w2.write(_crc8(hdr), 8)
        if left_side:
            _write_subframe(w2, blk[:, 0], bps)
            _write_subframe(w2, blk[:, 0] - blk[:, 1], bps + 1)
        else:
            for c in range(nch):
                _write_subframe(w2, blk[:, c], bps)
        w2.align()
        frame = w2.bytes()
        out += frame
        out += struct.pack(">H", _crc16(frame))
    return bytes(out)
