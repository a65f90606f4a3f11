"""WebDataset tar shards (sources/webdataset.py): engine<->stdlib round trips,
shard splitting, caption-less samples, foreign-member tolerance."""

import glob
import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.sources.webdataset import (
    read_tar_shards,
    write_tar_shards,
)

_SCHEMA = "image_id string, bytes binary, fmt string, caption string"


def _rows(n, fmt="png"):
    return [
        ("img%04d" % i, bytes([i % 251, (i * 7) % 251] * 8), fmt,
         "caption %d é" % i)
        for i in range(n)
    ]


def test_engine_write_stdlib_read(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.createDataFrame(_rows(30), _SCHEMA).coalesce(2)
    manifest = write_tar_shards(df, out).collect()
    assert sum(m["members"] for m in manifest) == 30
    got = {}
    for shard in glob.glob(os.path.join(out, "*.tar")):
        with tarfile.open(shard) as tf:
            for m in tf:
                got[m.name] = tf.extractfile(m).read()
    for key, img, fmt, cap in _rows(30):
        assert got[f"{key}.{fmt}"] == img
        assert got[f"{key}.txt"].decode() == cap
    # deterministic member bytes: mtime pinned to 0
    with tarfile.open(glob.glob(os.path.join(out, "*.tar"))[0]) as tf:
        assert all(m.mtime == 0 for m in tf)


def test_stdlib_write_engine_read(spark, tmp_path):
    shard = tmp_path / "external-000.tar"
    rows = _rows(12, fmt="jpg")
    with tarfile.open(shard, "w") as tf:
        for key, img, fmt, cap in rows:
            for name, data in ((f"{key}.{fmt}", img),
                               (f"{key}.txt", cap.encode())):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
            # a foreign sidecar member must be ignored, not crash the parse
            info = tarfile.TarInfo(f"{key}.json")
            info.size = 2
            tf.addfile(info, io.BytesIO(b"{}"))
    df = read_tar_shards(spark, str(shard))
    out = {r["image_id"]: r for r in df.collect()}
    assert len(out) == 12
    for key, img, _fmt, cap in rows:
        assert bytes(out[key]["bytes"]) == img
        assert out[key]["fmt"] == "jpeg"  # jpg normalized
        assert out[key]["caption"] == cap
    assert all(r["shard"].endswith("external-000.tar") for r in out.values())


def test_roundtrip_and_null_captions(spark, tmp_path):
    out = str(tmp_path / "rt")
    rows = [("a", b"\x01\x02", "png", "has cap"), ("b", b"\x03", "png", None)]
    df = spark.createDataFrame(rows, _SCHEMA).coalesce(1)
    write_tar_shards(df, out).collect()
    back = read_tar_shards(spark, os.path.join(out, "*.tar"))
    got = {r["image_id"]: r for r in back.collect()}
    assert got["a"]["caption"] == "has cap"
    assert got["b"]["caption"] is None
    assert bytes(got["b"]["bytes"]) == b"\x03"


def test_max_members_splits_shards(spark, tmp_path):
    out = str(tmp_path / "split")
    df = spark.createDataFrame(_rows(25), _SCHEMA).coalesce(1)
    manifest = sorted(
        write_tar_shards(df, out, max_members=10).collect(),
        key=lambda m: m["shard"],
    )
    assert [m["members"] for m in manifest] == [10, 10, 5]
    # key ranges in the manifest are the resume/lineage unit
    assert manifest[0]["first_key"] == "img0000"
    assert manifest[-1]["last_key"] == "img0024"
    # shards re-read to the full sample set
    assert read_tar_shards(spark, os.path.join(out, "*.tar")).count() == 25


def test_one_task_per_shard(spark, tmp_path):
    out = str(tmp_path / "par")
    df = spark.createDataFrame(_rows(40), _SCHEMA).repartition(4)
    write_tar_shards(df, out).collect()
    n_shards = len(glob.glob(os.path.join(out, "*.tar")))
    assert n_shards == 4
    back = read_tar_shards(spark, os.path.join(out, "*.tar"))
    # binaryFile is non-splittable: the shard is the task unit
    assert back.rdd.getNumPartitions() >= 1
    assert back.count() == 40
    assert back.select("shard").distinct().count() == n_shards


def test_missing_columns_fail_loud(spark):
    df = spark.createDataFrame([("a", b"x")], "image_id string, bytes binary")
    with pytest.raises(ValueError, match="missing \\['fmt'\\]"):
        write_tar_shards(df, "/tmp/nowhere")
