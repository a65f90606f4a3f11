"""Windows BMP codec — pure numpy, no dependencies.

The last of the common scraped-corpus still-image formats after
JPEG/PNG/GIF (BMP is what clipboard dumps and legacy Windows tooling
emit).  Uncompressed BI_RGB only — which is ~all real BMPs — at 8-bit
paletted, 24-bit BGR and 32-bit BGRA depths, bottom-up and top-down row
orders, 4-byte row padding.  RLE4/RLE8/bitfields raise loudly.  Exact
format => the tests assert EXACT pixel equality against the JVM's
javax.imageio in both directions (same protocol as the GIF codec).
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(buf: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB (alpha dropped; palette expanded)."""
    buf = bytes(buf)
    if buf[:2] != b"BM":
        raise ValueError(f"not a BMP: {buf[:2]!r}")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core-header size {hdr_size} (OS/2) unsupported")
    w, h_signed = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression not in (0, 3):  # BI_RGB; BI_BITFIELDS tolerated for the
        # standard 8888 layout only (checked below)
        raise NotImplementedError(f"BMP compression {compression} (RLE?) unsupported")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bpp {bpp} unsupported (8/24/32 only)")
    if compression == 3:
        if bpp != 32:
            raise NotImplementedError("BI_BITFIELDS only supported at 32 bpp")
        masks = struct.unpack_from("<III", buf, 54)
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError(f"BMP non-standard bitfields {masks}")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = (w * bpp // 8 + 3) & ~3
    if bpp == 8:
        n_colors = struct.unpack_from("<I", buf, 46)[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(buf, np.uint8, n_colors * 4, pal_off).reshape(-1, 4)
        palette = pal[:, [2, 1, 0]]  # BGRA -> RGB
        rows = np.frombuffer(buf, np.uint8, row_bytes * h, data_off).reshape(h, row_bytes)
        idx = rows[:, :w]
        if idx.max(initial=0) >= len(palette):
            raise ValueError("corrupt BMP: palette index out of range")
        img = palette[idx]
    else:
        c = bpp // 8
        rows = np.frombuffer(buf, np.uint8, row_bytes * h, data_off).reshape(h, row_bytes)
        px = rows[:, : w * c].reshape(h, w, c)
        img = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP."""
    p = np.ascontiguousarray(pixels, np.uint8)
    h, w, c = p.shape
    if c != 3:
        raise ValueError("encode_bmp takes (h, w, 3)")
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), np.uint8)
    body[:, : w * 3] = p[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data
