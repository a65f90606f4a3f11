"""End-to-end ingest composition: WebDataset shards -> EXIF auto-orient ->
seeded augmentation -> snapshot-log commit -> time-travel read.

The full training-data ingest shape the final-session modules add up to,
exercised as one pipeline on real bytes (every codec/transform in the
chain is the engine's own)."""

import numpy as np
from pyspark.sql import functions as F

from incubator_sedona_spark.sources.augment import (
    augment_params,
    augment_pixels,
    augment_images_df,
)
from incubator_sedona_spark.sources.exif import build_exif_app1, insert_app1
from incubator_sedona_spark.sources.images import decode_image, phash64
from incubator_sedona_spark.sources.jpeg_encode import encode_jpeg
from incubator_sedona_spark.sources.snapshots import SnapshotTable
from incubator_sedona_spark.sources.webdataset import (
    read_tar_shards,
    write_tar_shards,
)


def _jpeg(i, rot=False):
    rng = np.random.RandomState(100 + i)
    px = rng.randint(0, 255, size=(16, 12, 3)).astype(np.uint8)
    buf = encode_jpeg(px)
    if rot:
        buf = insert_app1(buf, build_exif_app1(6))
    return buf


def test_ingest_pipeline_end_to_end(spark, tmp_path):
    # 1. the corpus arrives as WebDataset tar shards (half EXIF-rotated)
    rows = [
        ("img%02d" % i, _jpeg(i, rot=(i % 2 == 1)), "jpeg", "caption %d" % i)
        for i in range(10)
    ]
    raw = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, caption string"
    ).coalesce(2)
    shard_dir = str(tmp_path / "shards")
    manifest = write_tar_shards(raw, shard_dir).collect()
    assert sum(m["members"] for m in manifest) == 10

    # 2. distributed read back; 3. upright + augment in fused decode passes
    corpus = read_tar_shards(spark, shard_dir + "/*.tar")
    from incubator_sedona_spark.sources.images import decode_images_df

    upright = decode_images_df(corpus, auto_orient=True)
    # rotated inputs (orientation 6) decode to swapped dims, upright
    dims = {r["image_id"]: (r["dec_h"], r["dec_w"]) for r in upright.collect()}
    assert dims["img00"] == (16, 12) and dims["img01"] == (12, 16)

    aug = augment_images_df(
        corpus.select("image_id", "bytes", "caption"), 8, 8, seed=4
    ).withColumn("w", F.lit(8)).withColumn("h", F.lit(8))

    # 4. land as a snapshot-log commit of the canonical image table
    table_loc = str(tmp_path / "table")
    t = SnapshotTable(table_loc)
    from incubator_sedona_spark.sources.iceberg import canonicalize_image_schema

    batch = aug.select(
        "image_id", "bytes", "w", "h", "fmt",
        "caption",
        F.xxhash64("image_id").alias("phash"),
    )
    s1 = t.append(canonicalize_image_schema(batch))
    assert s1 == 1

    # 5. time-travel read returns the exact augmented bytes, captions intact
    back = t.read(spark, snapshot_id=1)
    got = {r["image_id"]: r for r in back.collect()}
    assert len(got) == 10
    src = {k: (b, c) for k, b, _f, c in rows}
    for key, r in got.items():
        assert r["caption"] == src[key][1]
        flip, s, cx, cy = augment_params(key, 4, 0.5, (0.6, 1.0))
        want = augment_pixels(decode_image(src[key][0]), 8, 8, flip, s, cx, cy)
        have = decode_image(bytes(r["bytes"]))
        assert np.array_equal(have, want)
        assert phash64(have) == phash64(want)
    # append a second epoch: snapshot 1 stays pinned at 10 rows
    t.append(canonicalize_image_schema(batch.limit(3)))
    assert t.read(spark, snapshot_id=1).count() == 10
    assert t.read(spark).count() == 13
