"""Checkpoint/resume + metrics ledger tests."""

import json
import os

from pyspark.sql import functions as F

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.plans.checkpoint import (
    CheckpointedRun,
    read_checkpointed,
    run_partitioned_with_checkpoints,
)
from incubator_sedona_spark.plans.metrics import cell_metrics


def test_checkpoint_resume(spark, tmp_path):
    base = str(tmp_path / "ckpt")
    df = spark.range(0, 100).withColumn("unit", (F.col("id") % 4).cast("int"))
    run = run_partitioned_with_checkpoints(
        spark, df, "unit", [0, 1], base, transform=lambda d: d.withColumn("v", F.col("id") * 2)
    )
    assert run.completed_units() == {"0", "1"}
    # simulate resume: units 0,1 skipped (ledger row count stays 2 for them)
    before = open(run.ledger_path).read().count("\n")
    run = run_partitioned_with_checkpoints(
        spark, df, "unit", [0, 1, 2, 3], base, transform=lambda d: d.withColumn("v", F.col("id") * 2)
    )
    after = open(run.ledger_path).read().count("\n")
    assert after - before == 2  # only units 2,3 executed
    total = read_checkpointed(spark, base).count()
    assert total == 100
    recs = [json.loads(l) for l in open(run.ledger_path)]
    assert all(r["rows"] == 25 and r["seconds"] >= 0 for r in recs)


def test_cell_metrics_ledger(spark):
    grid = Grid(0.0, 0.0, 100.01, 100.01, 2)
    df = spark.createDataFrame(
        [(5.0, 5.0), (5.1, 5.2), (80.0, 80.0)], "x double, y double"
    )
    m = cell_metrics(df, grid, "x", "y").collect()
    by_lineage = {r.lineage: r.row_count for r in m}
    assert by_lineage == {"00": 2, "33": 1}
