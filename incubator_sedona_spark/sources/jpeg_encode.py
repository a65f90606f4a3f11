"""Pure-numpy baseline JPEG encoder (ITU-T T.81 sequential DCT, SOF0).

Closes the write side of the web's dominant image format: the package
already DECODES baseline + progressive JPEG with no dependencies
(``sources/jpeg.py``); this module produces interchange-format streams
(JFIF APP0, DQT, SOF0, DHT, SOS) that any decoder reads — verified both
by our own decoder and by JVM javax.imageio on the same bytes (the
codec-verification strategy every codec in this package uses).

Encoder choices (all spec-standard, none exotic):

  * Quantization: Annex K tables K.1/K.2 scaled by the widely-published
    libjpeg quality formula (quality 1-100; 50 = tables verbatim).
  * Entropy coding: the Annex K.3 "typical" Huffman tables — the same
    four tables the decoder splices for table-less AVI1 frames.  Fixed
    tables keep the encoder one-pass; an optimizing encoder would build
    per-image tables (T.81 Annex C) for ~5-10% smaller files.
  * Subsampling: 4:2:0 (2x2 box-averaged chroma, the web default) or
    4:4:4.  Grayscale input emits a single-component scan.
  * Forward DCT: orthonormal DCT-II as one einsum over all blocks —
    the exact transpose of the decoder's IDCT path.

The per-block entropy loop is driver/executor-side Python over numpy-
prepared symbols — fine for the thumbnail/tile sizes the image pipeline
re-encodes after resize/crop (mapInPandas batches), not a bulk
transcoder for full-resolution photography.

Reference semantics: ITU-T T.81 (1992) §F.1, Annex C (code assignment),
Annex F.1.2 (DC/AC encoding procedure), Annex K (tables).  Quality
scaling: libjpeg's jcparam.c formula (public, reimplemented here from
its documented definition).
"""

from __future__ import annotations

import struct

import numpy as np

from incubator_sedona_spark.sources.jpeg import _ZIGZAG

# Annex K.1 / K.2 quantization tables (natural row-major order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (BITS counts per length 1..16, HUFFVAL).
# Same tables avi._std_dht_segment serializes; declared here in the
# encoder's native (counts, values) form.
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], _AC_LUMA_VALS)
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], _AC_CHROMA_VALS)


def _quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 keeps the table, 100 -> all ones."""
    q = int(quality)
    if not 1 <= q <= 100:
        raise ValueError(f"quality must be in 1..100, got {quality}")
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _build_codes(counts: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C canonical code assignment: symbol -> (code, bit length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DCT8 = None  # orthonormal DCT-II basis, built lazily


def _dct_matrix() -> np.ndarray:
    global _DCT8
    if _DCT8 is None:
        n = np.arange(8)
        c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
        c *= np.sqrt(2.0 / 8.0)
        c[0] *= np.sqrt(0.5)
        _DCT8 = c
    return _DCT8


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81 B.1.1.5)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill to byte boundary
        return bytes(self.buf)


def _csize(v: int) -> int:
    """DC/AC magnitude category (SSSS): bit length of |v|."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _plane_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(n_blocks_y, n_blocks_x, 64) quantized zigzag coefficients."""
    h, w = plane.shape
    ph = -h % 8
    pw = -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .astype(np.float64)
        - 128.0
    )
    c = _dct_matrix()
    coef = np.einsum("ij,abjk,lk->abil", c, blocks, c, optimize=True)
    q = np.round(coef / quant[None, None, :, :]).astype(np.int32)
    # zz[k] = natural[_ZIGZAG[k]] — _ZIGZAG maps zigzag index -> natural
    # index (the decoder does the inverse: blocks[:, _ZIGZAG] = coefs_zz)
    return q.reshape(q.shape[0], q.shape[1], 64)[:, :, _ZIGZAG]


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    """Entropy-encode one zigzag block; returns the new DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    s = _csize(diff)
    w.put(*dc_codes[s])
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(zz[1:])[0]
    last = -1
    for idx in nz:
        run = idx - last - 1
        last = idx
        while run >= 16:
            w.put(*ac_codes[0xF0])  # ZRL
            run -= 16
        v = int(zz[1 + idx])
        s = _csize(v)
        w.put(*ac_codes[(run << 4) | s])
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
    if last != 62:  # last nonzero was not zigzag position 63
        w.put(*ac_codes[0x00])  # EOB
    return dc


def _segment(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "4:2:0"
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 pixels as baseline JPEG."""
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {img.dtype}")
    gray = img.ndim == 2 or (img.ndim == 3 and img.shape[2] == 1)
    if not gray and not (img.ndim == 3 and img.shape[2] == 3):
        raise ValueError(f"expected HxW or HxWx3 image, got shape {img.shape}")
    if subsampling not in ("4:2:0", "4:4:4"):
        raise ValueError(f"subsampling must be '4:2:0' or '4:4:4', got {subsampling}")
    h, w = img.shape[:2]
    if h < 1 or w < 1:
        raise ValueError(f"empty image {img.shape}")
    ql = _quality_scaled(QUANT_LUMA, quality)
    qc = _quality_scaled(QUANT_CHROMA, quality)

    if gray:
        y = img.reshape(h, w).astype(np.float64)
        planes = [(y, ql, (1, 1))]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        if subsampling == "4:2:0":
            ph = -h % 2
            pw = -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [(yy, ql, (2, 2)), (cb, qc, (1, 1)), (cr, qc, (1, 1))]
        else:
            planes = [(yy, ql, (1, 1)), (cb, qc, (1, 1)), (cr, qc, (1, 1))]

    # for 4:2:0 the luma grid must cover whole MCUs (16x16 pixels): pad the
    # luma plane so its block grid is even in both axes
    hmax = max(p[2][0] for p in planes)
    vmax = max(p[2][1] for p in planes)
    blocks = []
    for plane, quant, (hs, vs) in planes:
        zz = _plane_blocks(plane, quant)
        by, bx = zz.shape[0], zz.shape[1]
        # number of MCU rows/cols this plane must cover
        mcuy = -(-h // (8 * vmax))
        mcux = -(-w // (8 * hmax))
        want_by, want_bx = mcuy * vs, mcux * hs
        if by < want_by or bx < want_bx:
            zz = np.pad(
                zz, ((0, want_by - by), (0, want_bx - bx), (0, 0)), mode="edge"
            )
        blocks.append((zz, hs, vs))

    dc_l = _build_codes(*DC_LUMA)
    ac_l = _build_codes(*AC_LUMA)
    dc_c = _build_codes(*DC_CHROMA)
    ac_c = _build_codes(*AC_CHROMA)
    writer = _BitWriter()
    mcuy = -(-h // (8 * vmax))
    mcux = -(-w // (8 * hmax))
    preds = [0] * len(blocks)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (zz, hs, vs) in enumerate(blocks):
                dc_t, ac_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for byy in range(vs):
                    for bxx in range(hs):
                        preds[ci] = _encode_block(
                            writer,
                            zz[my * vs + byy, mx * hs + bxx],
                            preds[ci],
                            dc_t,
                            ac_t,
                        )
    scan = writer.finish()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _segment(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    zig = _ZIGZAG
    out += _segment(0xDB, b"\x00" + bytes(int(v) for v in ql.ravel()[zig]))
    if not gray:
        out += _segment(0xDB, b"\x01" + bytes(int(v) for v in qc.ravel()[zig]))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    if gray:
        sof += bytes([1, 0x11, 0])
    else:
        hs0, vs0 = (2, 2) if subsampling == "4:2:0" else (1, 1)
        sof += bytes([1, (hs0 << 4) | vs0, 0])
        sof += bytes([2, 0x11, 1])
        sof += bytes([3, 0x11, 1])
    out += _segment(0xC0, sof)
    dht = bytearray()
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if not gray:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc_th, (counts, vals) in tables:
        dht += bytes([tc_th]) + bytes(counts) + bytes(vals)
    out += _segment(0xC4, bytes(dht))
    sos = bytes([ncomp])
    sos += bytes([1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += _segment(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)
