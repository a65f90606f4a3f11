"""Resumable per-partition batch checkpointing with lineage + metrics.

The north-star requirement (BASELINE.json): execution resumable from
per-partition checkpoints with per-cell-partition row-count/latency metrics.
The reference has no such machinery (its streaming surface is stateless,
SURVEY.md §2.11) — this module adds it Spark-natively:

- work is split by a partition-key column (typically a cell-id prefix);
- each unit writes an independent parquet directory + a _SUCCESS-gated
  metrics row (unit, rows, wall seconds, lineage);
- a resumed run lists completed units from the ledger and skips them.

At cluster scale each unit is a normal distributed write (the unit filter
prunes on the partition column), so checkpointing costs no extra shuffle.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class CheckpointedRun:
    base_dir: str

    @property
    def ledger_path(self) -> str:
        return os.path.join(self.base_dir, "_ledger.jsonl")

    def completed_units(self) -> set[str]:
        done = set()
        if os.path.exists(self.ledger_path):
            with open(self.ledger_path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        done.add(rec["unit"])
        return done

    def record(self, rec: dict) -> None:
        os.makedirs(self.base_dir, exist_ok=True)
        with open(self.ledger_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def run_partitioned_with_checkpoints(
    spark: SparkSession,
    df: DataFrame,
    unit_col: str,
    units: list,
    base_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> CheckpointedRun:
    """Execute ``transform(df where unit_col == u)`` per unit, checkpointed.

    Already-completed units (from a previous crashed/killed run) are skipped.
    Each unit's output lands in ``base_dir/unit=<u>/`` with a ledger row
    containing row count + latency + lineage — the persisted analog of the
    reference's per-task accumulators (JoinQuery.java:538-541).
    """
    run = CheckpointedRun(base_dir)
    done = run.completed_units()
    for u in units:
        su = str(u)
        if su in done:
            continue
        t0 = time.time()
        part = df.where(F.col(unit_col) == u)
        if transform is not None:
            part = transform(part)
        out_dir = os.path.join(base_dir, f"unit={su}")
        part.write.mode("overwrite").parquet(out_dir)
        rows = spark.read.parquet(out_dir).count()
        run.record(
            {
                "unit": su,
                "status": "done",
                "rows": rows,
                "seconds": round(time.time() - t0, 3),
                "path": out_dir,
                "ts": int(time.time()),
            }
        )
    return run


def read_checkpointed(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, "unit=*"))
