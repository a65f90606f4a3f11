"""EXIF (APP1) metadata for the JPEG path: parse, write, auto-orient.

Web-scraped JPEGs routinely store pixels rotated with an EXIF Orientation
tag (phone cameras); a pipeline that ignores it trains on sideways images
with phashes that do not match any upright copy.  This module implements
the relevant slice of the EXIF 2.32 / TIFF 6.0 specs with no dependencies:

- ``parse_exif``: walk JPEG markers to APP1 ``Exif\\0\\0``, parse the TIFF
  header (both byte orders) + IFD0 and the Exif sub-IFD; returns the tags
  a pipeline acts on (Orientation, Make/Model/DateTime, pixel dimensions).
- ``apply_orientation`` / ``undo_orientation_table``: the 8 canonical
  transforms (the same table PIL's ``ImageOps.exif_transpose`` implements),
  as pure numpy views — zero-copy where possible.
- ``build_exif_app1`` + ``insert_app1``: a minimal writer, used by the
  tests to round-trip orientations through our own encoder and available to
  the thumbnail sink.
- ``exif_df``: one mapInPandas pass adding (orientation, make, model,
  datetime) columns; ``decode_images_df(auto_orient=True)`` in images.py
  applies the transform right after decode, inside the same Arrow batch.

Reference parity note: the reference decodes imagery through Java ImageIO
(`sql/common/.../io/raster/GeotiffSchema.scala:121-200`), which does not
apply EXIF orientation either — auto-orient is opt-in here, default off, so
decoded-pixel invariants vs the reference stay byte-stable.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

# IFD0 / Exif-IFD tags a training pipeline uses
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_DATETIME_ORIGINAL = 0x9003
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _find_app1(buf: bytes) -> bytes | None:
    """Return the APP1 Exif payload (after 'Exif\\0\\0') or None."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            return None
        marker = buf[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: no APP1 ahead of scan data
            return None
        seg_len = struct.unpack(">H", buf[i + 2:i + 4])[0]
        if marker == 0xE1 and buf[i + 4:i + 10] == b"Exif\x00\x00":
            return buf[i + 10:i + 2 + seg_len]
        i += 2 + seg_len
    return None


def _read_ifd(tiff: bytes, bo: str, off: int) -> dict[int, object]:
    """One IFD -> {tag: value}; SHORT/LONG/ASCII/RATIONAL handled."""
    out: dict[int, object] = {}
    if off + 2 > len(tiff):
        return out
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(tiff):
            break
        tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        voff = e + 8 if total <= 4 else struct.unpack_from(bo + "I", tiff, e + 8)[0]
        if voff + total > len(tiff):
            continue
        raw = tiff[voff:voff + total]
        if typ == 2:  # ASCII, NUL-terminated
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3:
            vals = struct.unpack(bo + "H" * cnt, raw)
            out[tag] = vals[0] if cnt == 1 else list(vals)
        elif typ in (4, 9):
            fmt = "I" if typ == 4 else "i"
            vals = struct.unpack(bo + fmt * cnt, raw)
            out[tag] = vals[0] if cnt == 1 else list(vals)
        elif typ in (5, 10):  # RATIONAL pairs
            fmt = "II" if typ == 5 else "ii"
            vals = struct.unpack(bo + fmt * cnt, raw)
            pairs = [(vals[2 * i], vals[2 * i + 1]) for i in range(cnt)]
            out[tag] = pairs[0] if cnt == 1 else pairs
    return out


def parse_exif(buf: bytes) -> dict:
    """Parse EXIF from JPEG bytes; always returns a dict (orientation
    defaults to 1 when absent — the spec's 'top-left' identity)."""
    out = {"orientation": 1, "make": None, "model": None, "datetime": None,
           "pixel_x": None, "pixel_y": None}
    tiff = _find_app1(buf)
    if tiff is None or len(tiff) < 8:
        return out
    order = tiff[0:2]
    bo = "<" if order == b"II" else ">" if order == b"MM" else None
    if bo is None or struct.unpack_from(bo + "H", tiff, 2)[0] != 42:
        return out
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    ifd0 = _read_ifd(tiff, bo, ifd0_off)
    o = ifd0.get(TAG_ORIENTATION, 1)
    out["orientation"] = o if isinstance(o, int) and 1 <= o <= 8 else 1
    out["make"] = ifd0.get(TAG_MAKE)
    out["model"] = ifd0.get(TAG_MODEL)
    out["datetime"] = ifd0.get(TAG_DATETIME)
    sub_off = ifd0.get(TAG_EXIF_IFD)
    if isinstance(sub_off, int):
        sub = _read_ifd(tiff, bo, sub_off)
        out["datetime"] = sub.get(TAG_DATETIME_ORIGINAL, out["datetime"])
        out["pixel_x"] = sub.get(TAG_PIXEL_X)
        out["pixel_y"] = sub.get(TAG_PIXEL_Y)
    return out


def apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Return the upright image for stored pixels + EXIF orientation.

    The undo table (EXIF 2.32 §4.6.4 row0/col0 semantics; identical to
    PIL ImageOps.exif_transpose):
      1 identity · 2 mirror-H · 3 rot180 · 4 mirror-V · 5 transpose ·
      6 rot90CW · 7 transverse · 8 rot90CCW
    """
    if orientation == 1:
        return arr
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1, :]
    if orientation == 5:
        return arr.swapaxes(0, 1)
    if orientation == 6:
        return np.rot90(arr, k=-1)
    if orientation == 7:
        return arr[::-1, ::-1].swapaxes(0, 1)
    if orientation == 8:
        return np.rot90(arr, k=1)
    raise ValueError(f"EXIF orientation must be 1..8, got {orientation}")


def build_exif_app1(orientation: int = 1, make: str | None = None,
                    model: str | None = None, byte_order: str = "II") -> bytes:
    """Minimal APP1 segment (marker + length + Exif header + IFD0)."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation must be 1..8, got {orientation}")
    bo = "<" if byte_order == "II" else ">"
    entries: list[tuple[int, int, int, bytes]] = [
        (TAG_ORIENTATION, 3, 1, struct.pack(bo + "H", orientation) + b"\x00\x00"),
    ]
    extra = b""
    # ASCII values >4 bytes go to the overflow area after the IFD
    for tag, text in ((TAG_MAKE, make), (TAG_MODEL, model)):
        if text is None:
            continue
        raw = text.encode("ascii") + b"\x00"
        if len(raw) <= 4:
            entries.append((tag, 2, len(raw), raw.ljust(4, b"\x00")))
        else:
            entries.append((tag, 2, len(raw), b"OFFS"))  # patched below
            extra += raw
    entries.sort(key=lambda t: t[0])

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    body = struct.pack(bo + "H", len(entries))
    cursor = overflow_off
    patched = []
    for tag, typ, cnt, val in entries:
        if val == b"OFFS":
            patched.append(struct.pack(bo + "HHII", tag, typ, cnt, cursor))
            cursor += _TYPE_SIZE[typ] * cnt
        else:
            patched.append(struct.pack(bo + "HHI", tag, typ, cnt) + val)
    body += b"".join(patched) + struct.pack(bo + "I", 0)
    tiff = (byte_order.encode() + struct.pack(bo + "HI", 42, ifd_off)
            + body + extra)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (after APP0 if present)."""
    if jpeg[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    if jpeg[2:4] == b"\xff\xe0":  # keep JFIF APP0 first, per convention
        pos = 4 + struct.unpack(">H", jpeg[4:6])[0]
    return jpeg[:pos] + app1 + jpeg[pos:]


def exif_df(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Add (exif_orientation int, exif_make string, exif_model string,
    exif_datetime string) via one Arrow-batched mapInPandas pass.  Non-JPEG
    or EXIF-less rows get the defaults (orientation 1, NULL strings)."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("exif_orientation", IntegerType()),
            StructField("exif_make", StringType()),
            StructField("exif_model", StringType()),
            StructField("exif_datetime", StringType()),
        ]
    )

    _NULL_META = {"orientation": 1, "make": None, "model": None,
                  "datetime": None, "pixel_x": None, "pixel_y": None}

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL bytes (e.g. metadata-only rows for failed fetches) get
            # the defaults, per the docstring contract
            metas = [parse_exif(bytes(b)) if b is not None else _NULL_META
                     for b in pdf[bytes_col]]
            pdf = pdf.copy()
            pdf["exif_orientation"] = np.array(
                [m["orientation"] for m in metas], dtype=np.int32
            )
            for col, key in (("exif_make", "make"), ("exif_model", "model"),
                             ("exif_datetime", "datetime")):
                pdf[col] = [m[key] for m in metas]
            yield pdf

    return df.mapInPandas(_run, schema=schema)
