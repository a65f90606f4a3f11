"""Streaming parity: engine ops run unchanged under Structured Streaming
(reference contract: python/tests/streaming/spark/test_constructor_functions.py:327-336)."""

import numpy as np

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.streaming.ops import streaming_enrich, streaming_tile_counts


def test_streaming_enrich_and_counts(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    rng = np.random.default_rng(9)
    pdf = [(float(x), float(y)) for x, y in rng.uniform(0, 100, (200, 2))]
    batch = spark.createDataFrame(pdf, "x double, y double")
    batch.write.parquet(src)

    stream = spark.readStream.schema("x double, y double").parquet(src)
    grid = Grid(0.0, 0.0, 100.01, 100.01, 4)
    counts = streaming_tile_counts(stream, grid, "x", "y", (0.0, 0.0, 100.0, 100.0), 16)
    q = (
        counts.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(cnt) AS total FROM tile_counts").collect()[0].total
    assert got == 200
    # batch/stream parity: same counts as the batch plan
    batch_counts = (
        streaming_enrich(batch, grid, "x", "y", (0.0, 0.0, 100.0, 100.0), 16)
        .groupBy("tile_x", "tile_y")
        .count()
    )
    stream_counts = {(r.tile_x, r.tile_y): r.cnt for r in spark.sql("SELECT * FROM tile_counts").collect()}
    for r in batch_counts.collect():
        assert stream_counts[(r.tile_x, r.tile_y)] == r["count"]
