"""Deterministic per-image augmentation — seeded crop/flip, one fused pass.

Training pipelines augment at ingest (random resized crop + horizontal
flip is the standard vision recipe), but a 100-TB job cannot carry RNG
state: retried tasks and resumed checkpoints must produce byte-identical
shards.  Every stochastic choice here is therefore a pure function of
``(image_id, seed)`` via md5 — re-running any partition, in any order, on
any executor, yields the same bytes (the same determinism discipline as
the engine's split/sample ops in pipeline/packing.py).

One mapInPandas stage fuses decode -> crop -> resize -> flip -> encode;
pixels never re-cross the Arrow boundary between steps (the discipline of
images.resize_images_df).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .images import decode_image, encode_png, resize_pixels


def unit_hash(key: str) -> float:
    """Deterministic uniform in [0, 1) from a string key (md5 top 8 bytes)."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big") / 2.0**64


def augment_pixels(
    pixels: np.ndarray,
    out_h: int,
    out_w: int,
    flip: bool,
    scale: float,
    cx: float,
    cy: float,
) -> np.ndarray:
    """Crop a ``scale``-sized window positioned by (cx, cy) in [0,1]^2,
    resize to (out_h, out_w), then optionally mirror horizontally.

    ``scale=1, cx=cy=anything, flip=False`` with matching output dims is the
    identity (tested) — augmentation degrades gracefully to a plain resize.
    """
    if not 0.0 < scale <= 1.0:
        raise ValueError(f"scale must be in (0, 1], got {scale}")
    if not (0.0 <= cx <= 1.0 and 0.0 <= cy <= 1.0):
        raise ValueError(f"cx/cy must be in [0, 1], got ({cx}, {cy})")
    h, w, _ = pixels.shape
    ch = max(1, int(round(h * scale)))
    cw = max(1, int(round(w * scale)))
    y0 = int(round((h - ch) * cy))
    x0 = int(round((w - cw) * cx))
    crop = pixels[y0:y0 + ch, x0:x0 + cw]
    out = crop if (ch, cw) == (out_h, out_w) else resize_pixels(crop, out_h, out_w)
    return out[:, ::-1] if flip else out


def augment_params(image_id: str, seed: int, flip_p: float,
                   scale_range: tuple[float, float]) -> tuple[bool, float, float, float]:
    """The (flip, scale, cx, cy) draw for one image — pure and replayable."""
    lo, hi = scale_range
    flip = unit_hash(f"{image_id}:{seed}:flip") < flip_p
    scale = lo + (hi - lo) * unit_hash(f"{image_id}:{seed}:scale")
    cx = unit_hash(f"{image_id}:{seed}:cx")
    cy = unit_hash(f"{image_id}:{seed}:cy")
    return flip, scale, cx, cy


def augment_images_df(
    df: DataFrame,
    out_w: int,
    out_h: int,
    seed: int = 0,
    flip_p: float = 0.5,
    scale_range: tuple[float, float] = (0.6, 1.0),
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    out_fmt: str = "png",
    jpeg_quality: int = 85,
) -> DataFrame:
    """Decode -> seeded crop/resize/flip -> re-encode in one pass.

    Output replaces ``bytes`` and updates w/h/fmt; other columns pass
    through.  Change ``seed`` for a fresh epoch's augmentations — same
    table + same seed is bitwise reproducible on any cluster layout.
    """
    if not 0.0 < scale_range[0] <= scale_range[1] <= 1.0:
        raise ValueError(f"bad scale_range {scale_range}")
    if out_fmt not in ("png", "jpeg"):
        raise ValueError(f"out_fmt must be 'png' or 'jpeg', got {out_fmt!r}")
    fields = [f"{n} {t}" for n, t in
              [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
              if n not in (bytes_col, "w", "h", "fmt")]
    schema = ", ".join(fields + [f"{bytes_col} binary", "w int", "h int", "fmt string"])

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if out_fmt == "jpeg":
            from .jpeg_encode import encode_jpeg

            enc = lambda p: encode_jpeg(p, quality=jpeg_quality)  # noqa: E731
        else:
            enc = encode_png
        for pdf in batches:
            outs = []
            for key, buf in zip(pdf[id_col], pdf[bytes_col]):
                flip, scale, cx, cy = augment_params(
                    str(key), seed, flip_p, scale_range
                )
                pix = augment_pixels(
                    decode_image(bytes(buf)), out_h, out_w, flip, scale, cx, cy
                )
                outs.append(enc(pix))
            out = pdf.drop(columns=[c for c in (bytes_col, "w", "h", "fmt")
                                    if c in pdf.columns])
            out[bytes_col] = outs
            out["w"] = np.int32(out_w)
            out["h"] = np.int32(out_h)
            out["fmt"] = out_fmt
            yield out

    return df.mapInPandas(_run, schema=schema)
