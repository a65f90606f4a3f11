"""Pure-numpy GIF (87a/89a) codec — no external dependencies.

Web-scraped image corpora are heavily GIF (the third format after JPEG and
PNG); the reference decodes rasters through Java ImageIO which handles GIF
natively (sql/common/.../io/raster), so a corpus user switching to this
engine needs the format covered without PIL.  This module implements the
published GIF89a specification end-to-end:

  * variable-width LSB-first LZW (clear/EOI codes, early code-width change,
    4096-entry cap with deferred-clear tolerance),
  * global and local color tables, interlaced row ordering (8/8/4/2 pass),
  * GIF89a Graphic Control Extensions: transparency index, frame delays,
    disposal methods 1 (leave), 2 (restore background), 3 (restore
    previous) with correct multi-frame canvas compositing.

``decode_gif`` returns the first composed frame as (h, w, 3) uint8 —
the still-image contract shared with decode_png/decode_jpeg;
``decode_gif_frames`` yields every composed frame (the animation path,
mirroring sources/video.py's every-k sampling contract).  ``encode_gif``
writes single- or multi-frame GIFs for palettes up to 256 colors (loud
ValueError beyond — this encoder exists for fixtures and sinks, not for
quantization).  Correctness is established against the JVM: ImageIO both
writes GIFs our decoder must reproduce exactly and reads GIFs our encoder
produced (GIF is lossless given a palette, so the tests assert EXACT pixel
equality, not PSNR).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")


# -- LZW ---------------------------------------------------------------------


def _lzw_decode(data: bytes, mcs: int, npix: int) -> np.ndarray:
    """GIF-variant LZW: variable width mcs+1..12 bits, LSB-first."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW minimum code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while True:
        while nbits < width and pos < n:
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        if nbits < width:
            break  # truncated stream: tolerate (browsers do) — npix guard below
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(roots)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: first code after clear not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("corrupt GIF: LZW code beyond table")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if len(out) >= npix:
            break
    if len(out) < npix:
        raise ValueError(f"corrupt GIF: {len(out)} of {npix} pixels decoded")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = mcs + 1
    next_code = eoi + 1
    table: dict[tuple[int, int], int] = {}

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def bump() -> None:
        # mirror of the decoder's early change: its table size after
        # consuming our last code is next_code - 1
        nonlocal width
        if next_code - 1 >= (1 << width) and width < 12:
            width += 1

    emit(clear)
    seq = indices.tolist()
    w = seq[0]
    for k in seq[1:]:
        if (w, k) in table:
            w = table[(w, k)]
            continue
        bump()
        emit(w)
        if next_code >= 4096:
            bump()
            emit(clear)
            table = {}
            next_code = eoi + 1
            width = mcs + 1
        else:
            table[(w, k)] = next_code
            next_code += 1
        w = k
    bump()
    emit(w)
    next_code += 1
    bump()
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -- container ---------------------------------------------------------------

_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(s, h, step) for s, step in _PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(s, h, step) for s, step in _PASSES])
    return rows[order]


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        size = buf[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        parts.append(buf[pos : pos + size])
        pos += size


def decode_gif_frames(
    buf: bytes, max_frames: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """Composed frames: [(delay_centiseconds, (h, w, 3) uint8), ...].

    ``max_frames`` stops decoding after that many frames — compositing
    means frame k needs frames 0..k-1, so a sampler requesting up to index
    i passes max_frames=i+1 and pays O(i), not O(total)."""
    buf = bytes(buf)
    if buf[:6] not in GIF_SIGS:
        raise ValueError(f"not a GIF: signature {buf[:6]!r}")
    W, H = struct.unpack_from("<HH", buf, 6)
    packed, bg = buf[10], buf[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg < len(gct):
        canvas = np.broadcast_to(gct[bg], (H, W, 3)).copy()
        bg_rgb = gct[bg].copy()
    else:
        canvas = np.zeros((H, W, 3), np.uint8)
        bg_rgb = np.zeros(3, np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    transp: int | None = None
    disposal = 0
    delay = 0
    while pos < len(buf):
        blk = buf[pos]
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:  # extension
            label = buf[pos + 1]
            data, pos = _read_subblocks(buf, pos + 2)
            if label == 0xF9 and len(data) >= 4:
                gp, delay = data[0], struct.unpack_from("<H", data, 1)[0]
                disposal = (gp >> 2) & 0x07
                transp = data[3] if gp & 0x01 else None
            continue
        if blk != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{blk:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", buf, pos + 1)
        p2 = buf[pos + 9]
        pos += 10
        lct = None
        if p2 & 0x80:
            n = 2 << (p2 & 0x07)
            lct = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("corrupt GIF: image with neither local nor global color table")
        mcs = buf[pos]
        data, pos = _read_subblocks(buf, pos + 1)
        idx = _lzw_decode(data, mcs, w * h).reshape(h, w)
        if p2 & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("corrupt GIF: pixel index beyond color table")
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        px = palette[idx]
        if transp is not None:
            mask = idx != transp
            region[mask] = px[mask]
        else:
            region[...] = px
        frames.append((delay, canvas.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            canvas = saved  # type: ignore[assignment]
        transp, disposal, delay = None, 0, 0
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    return frames


def decode_gif(buf: bytes) -> np.ndarray:
    """First composed frame as (h, w, 3) uint8 (still-image contract)."""
    return decode_gif_frames(buf)[0][1]


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    loop: int | None = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 frame(s).  All frames share one global color
    table built from the union of their colors; > 256 distinct colors raise
    (this is a lossless sink, not a quantizer)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    H, W, _ = frames[0].shape
    for f in frames:
        if f.shape != (H, W, 3):
            raise ValueError("all frames must be (h, w, 3) and equally sized")
    packed = [
        (f[:, :, 0].astype(np.uint32) << 16)
        | (f[:, :, 1].astype(np.uint32) << 8)
        | f[:, :, 2].astype(np.uint32)
        for f in frames
    ]
    uniq = np.unique(np.concatenate([p.ravel() for p in packed]))
    if len(uniq) > 256:
        raise ValueError(
            f"GIF palette overflow: {len(uniq)} distinct colors (max 256); "
            "quantize upstream"
        )
    bits = max(1, int(np.ceil(np.log2(max(2, len(uniq))))))
    size = 1 << bits
    palette = np.zeros((size, 3), np.uint8)
    palette[: len(uniq), 0] = (uniq >> 16) & 0xFF
    palette[: len(uniq), 1] = (uniq >> 8) & 0xFF
    palette[: len(uniq), 2] = uniq & 0xFF
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", W, H)
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])
    out += palette.tobytes()
    if len(frames) > 1 and loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for i, p in enumerate(packed):
        if delays_cs is not None:
            out += b"\x21\xf9\x04\x04" + struct.pack("<H", delays_cs[i]) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, W, H)
        out += bytes([0x40 if interlace else 0x00])
        idx = np.searchsorted(uniq, p.ravel()).astype(np.int32).reshape(H, W)
        if interlace:
            idx = _interlace(idx)
        out += bytes([mcs])
        lzw = _lzw_encode(idx.ravel(), mcs)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
