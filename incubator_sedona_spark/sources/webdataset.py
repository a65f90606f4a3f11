"""WebDataset-style tar-shard source/sink for the image+caption corpus.

Billion-to-trillion-image training corpora are stored as POSIX tar shards
(the public WebDataset convention: members sharing a basename form one
sample — ``<key>.jpg`` + ``<key>.txt``), because object stores serve large
sequential reads far better than 10^12 tiny objects.  This module maps that
convention onto the engine's canonical table shape
``(image_id, bytes, fmt, caption)``:

- **sink** ``write_tar_shards``: one mapInPandas pass; each input partition
  packs its rows into in-memory tars (split at ``max_members`` /
  ``max_bytes``) and streams them to ``<out>/shard-<part>-<seq>.tar``
  through a pyarrow FileSystem (so ``s3://``-style URIs work wherever the
  cluster has a pyarrow fs; same pattern as pipeline/dedup.py's GEMM
  blocks).  Returns a manifest DataFrame (shard, members, bytes, key range)
  — the resumable unit ledger.
- **source** ``read_tar_shards``: ``spark.read.format("binaryFile")`` over
  the shard glob + one mapInPandas parse.  binaryFile is non-splittable, so
  the task unit IS the shard — exactly WebDataset's parallelism model; at
  10^12 images (~10k samples/GB-shard) that is ~10^8 tasks of ~1 GB each,
  scheduled like any other scan.

Scale notes: sample bytes cross the Arrow boundary once per direction; no
driver-side state beyond the returned manifest (collect it only if small —
it is one row per shard).  Deterministic layout: pre-sort with
``order_by=`` so shard contents are a pure function of the data, not of
scan order.

No counterpart exists in the reference (its sources are WKT/GeoJSON/Shapefile
readers — SURVEY.md §2.1); this is part of the training-pipeline extension
surface the brief mandates.
"""

from __future__ import annotations

import io
import os
import posixpath
import tarfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_SCHEMA = (
    "shard string, members int, bytes bigint, first_key string, last_key string"
)

# extensions understood as image payloads on read (WebDataset convention:
# anything that is not .txt/.json/.cls is the payload; we keep it to the
# formats the engine can decode or pass through)
_IMG_EXTS = {"png", "jpg", "jpeg", "bmp", "gif", "tif", "tiff", "ppm", "webp"}


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    max_members: int = 10_000,
    max_bytes: int = 1 << 30,
    order_by: str | None = None,
) -> DataFrame:
    """Pack ``(image_id, bytes, fmt, caption)`` rows into tar shards.

    Each row becomes two members, ``<image_id>.<fmt>`` and ``<image_id>.txt``
    (caption, UTF-8; omitted when caption is NULL).  A shard closes when it
    reaches ``max_members`` samples or ``max_bytes`` of payload.  Returns the
    shard manifest DataFrame; the write happens when the manifest is acted
    on (cache/collect/write it — it is one row per shard).
    """
    need = {"image_id", "bytes", "fmt"}
    missing = need - set(df.columns)
    if missing:
        raise ValueError(f"write_tar_shards needs columns {sorted(need)}; "
                         f"missing {sorted(missing)}")
    has_caption = "caption" in df.columns
    cols = ["image_id", "bytes", "fmt"] + (["caption"] if has_caption else [])
    if order_by is not None:
        df = df.repartitionByRange(order_by).sortWithinPartitions(order_by)
    df = df.select(*cols)

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyarrow import fs as pafs
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        filesystem, base = pafs.FileSystem.from_uri(out_dir) \
            if "://" in out_dir else (pafs.LocalFileSystem(), out_dir)
        filesystem.create_dir(base, recursive=True)

        seq = 0
        buf: io.BytesIO | None = None
        tf: tarfile.TarFile | None = None
        members = payload = 0
        first_key = last_key = None
        out_rows: list[dict] = []

        def _open() -> None:
            nonlocal buf, tf, members, payload, first_key
            buf = io.BytesIO()
            tf = tarfile.open(fileobj=buf, mode="w")
            members = payload = 0
            first_key = None

        def _close() -> None:
            nonlocal seq, tf, buf
            if tf is None or members == 0:
                return
            tf.close()
            name = f"shard-{pid:05d}-{seq:04d}.tar"
            path = posixpath.join(base, name)
            with filesystem.open_output_stream(path) as f:
                f.write(buf.getvalue())
            out_rows.append({
                "shard": path, "members": members, "bytes": len(buf.getvalue()),
                "first_key": first_key, "last_key": last_key,
            })
            seq += 1
            tf = buf = None

        def _add(name: str, data: bytes) -> None:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0  # deterministic bytes
            tf.addfile(info, io.BytesIO(data))

        _open()
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                key, img = str(row.image_id), bytes(row.bytes)
                cap = getattr(row, "caption", None)
                if members >= max_members or (members and payload >= max_bytes):
                    _close()
                    _open()
                _add(f"{key}.{row.fmt}", img)
                if has_caption and isinstance(cap, str):
                    _add(f"{key}.txt", cap.encode("utf-8"))
                members += 1
                payload += len(img)
                if first_key is None:
                    first_key = key
                last_key = key
        _close()
        yield pd.DataFrame(
            out_rows,
            columns=["shard", "members", "bytes", "first_key", "last_key"],
        )

    return df.mapInPandas(_pack, schema=_MANIFEST_SCHEMA)


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset tar shards back to ``(image_id, bytes, fmt, caption,
    shard)`` — one task per shard file.

    Members sharing a path-minus-extension key form a sample; ``.txt``
    supplies the caption (NULL when absent), the image extension supplies
    ``fmt`` (normalized ``jpg``→``jpeg``).  Samples with no image member are
    dropped; unknown extensions are ignored (forward-compatible with shards
    carrying extra per-sample members, e.g. ``.json`` metadata).
    """
    bin_df = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "fmt": [], "caption": [],
                   "shard": []}
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                samples: dict[str, dict] = {}
                order: list[str] = []
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        stem, dot, ext = m.name.rpartition(".")
                        if not dot:
                            continue
                        ext = ext.lower()
                        if ext != "txt" and ext not in _IMG_EXTS:
                            continue  # foreign sidecar member: never read
                        if stem not in samples:
                            samples[stem] = {}
                            order.append(stem)
                        data = tf.extractfile(m).read()
                        if ext == "txt":
                            samples[stem]["caption"] = data.decode("utf-8")
                        else:
                            samples[stem]["bytes"] = data
                            samples[stem]["fmt"] = (
                                "jpeg" if ext == "jpg" else ext
                            )
                for stem in order:
                    s = samples[stem]
                    if "bytes" not in s:
                        continue
                    out["image_id"].append(os.path.basename(stem))
                    out["bytes"].append(s["bytes"])
                    out["fmt"].append(s["fmt"])
                    out["caption"].append(s.get("caption"))
                    out["shard"].append(shard_path)
            yield pd.DataFrame(out)

    return bin_df.mapInPandas(
        _parse,
        schema="image_id string, bytes binary, fmt string, caption string, "
               "shard string",
    )
