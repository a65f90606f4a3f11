"""Iceberg-style table access for the image+caption corpus.

BASELINE.json's input_hint names an Iceberg table of
``(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash long)``.  This container ships no Iceberg runtime JAR, so the layer
does exactly what SURVEY.md §7.0 documents:

- when an Iceberg catalog IS configured (``spark.sql.catalog.*`` set and the
  runtime JAR on the classpath), reads/writes go through
  ``spark.read/writeTo`` with the real format — snapshot/time-travel options
  pass straight through;
- otherwise the SAME schema is stored as parquet and read through the same
  helper, so every engine operator downstream is format-agnostic.  Parquet
  and Iceberg share the file format and min/max column statistics, so the
  engine's pruning strategy (bbox/cell stat columns, partition pruning on
  cell prefixes) behaves identically — Iceberg adds snapshot isolation and
  manifest-level pruning on top, which this layer exposes when present.

The schema check is strict either way: a table that does not match the
input_hint shape fails loudly at read time, not deep inside a pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

IMAGE_TABLE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash bigint"
)

_EXPECTED = [
    ("image_id", "string"), ("bytes", "binary"), ("w", "int"), ("h", "int"),
    ("fmt", "string"), ("caption", "string"), ("phash", "bigint"),
]


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg runtime is importable in the JVM."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


_COMPATIBLE = {"int": {"int", "smallint", "bigint"}, "bigint": {"int", "bigint"}}


def validate_image_schema(df: DataFrame) -> DataFrame:
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    bad = [
        (name, typ)
        for name, typ in _EXPECTED
        if got.get(name) not in ({typ} | _COMPATIBLE.get(typ, set()))
    ]
    if bad:
        raise ValueError(
            f"image table does not match the input_hint schema; missing/"
            f"mismatched: {bad}; got: {sorted(got.items())}"
        )
    return df


def canonicalize_image_schema(df: DataFrame) -> DataFrame:
    """Cast to the exact input_hint types (pandas-inferred frames carry
    bigint where the hint says int32)."""
    from pyspark.sql import functions as F

    validate_image_schema(df)
    return df.select(
        *[F.col(name).cast(typ).alias(name) for name, typ in _EXPECTED],
        *[F.col(f.name) for f in df.schema.fields
          if f.name not in {n for n, _ in _EXPECTED}],
    )


def read_image_table(spark: SparkSession, location: str,
                     snapshot_id: int | None = None,
                     as_of_timestamp: int | None = None) -> DataFrame:
    """Read the image+caption table from an Iceberg identifier (``cat.db.t``)
    or a parquet path (the documented fallback).  Snapshot/time-travel
    options apply only on the Iceberg path (they have no parquet analog and
    raise loudly if requested without Iceberg)."""
    is_path = "/" in location or location.endswith(".parquet")
    if not is_path and iceberg_available(spark):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", as_of_timestamp)
        return validate_image_schema(reader.format("iceberg").load(location))
    from .snapshots import SnapshotTable, has_snapshot_log

    if is_path and has_snapshot_log(location):
        # parquet path with a snapshot log (sources/snapshots.py): full
        # snapshot-isolation + time-travel semantics, no Iceberg JAR needed
        return validate_image_schema(
            SnapshotTable(location).read(
                spark, snapshot_id=snapshot_id, as_of_timestamp=as_of_timestamp
            )
        )
    if snapshot_id is not None or as_of_timestamp is not None:
        raise NotImplementedError(
            "snapshot/time-travel reads need the Iceberg runtime JAR or a "
            "snapshot log (write with snapshot_log=True); this plain parquet "
            "path has neither"
        )
    return validate_image_schema(spark.read.parquet(location))


def write_image_table(
    df: DataFrame, location: str, mode: str = "append", snapshot_log: bool = False
) -> None:
    """Write through Iceberg (``writeTo`` with the v2 API) when available,
    parquet otherwise — same partitioning either way (caller pre-partitions;
    the engine's convention is bucketed/partitioned by cell or phash prefix).

    ``snapshot_log=True`` on the parquet path commits through the pure-
    metadata snapshot log (sources/snapshots.py), enabling snapshot-pinned
    and time-travel reads without the Iceberg runtime."""
    df = canonicalize_image_schema(df)
    spark = df.sparkSession
    is_path = "/" in location or location.endswith(".parquet")
    if not is_path and iceberg_available(spark):
        w = df.writeTo(location)
        (w.append() if mode == "append" else w.createOrReplace())
        return
    from .snapshots import SnapshotTable, has_snapshot_log

    if snapshot_log or (is_path and has_snapshot_log(location)):
        if not has_snapshot_log(location) and os.path.isdir(location) and any(
            f.endswith(".parquet") for f in os.listdir(location)
        ):
            # starting a log NEXT TO pre-existing plain parquet would make
            # those rows invisible to every snapshot read — a silent data
            # loss shape.  Fail loudly; the migration is an explicit
            # read-plain + append.
            raise ValueError(
                f"{location} already holds plain parquet files; starting a "
                f"snapshot log would hide them from all reads. Migrate "
                f"explicitly: df = spark.read.parquet(loc); "
                f"write_image_table(df, new_loc, snapshot_log=True)"
            )
        t = SnapshotTable(location)
        (t.append(df) if mode == "append" else t.overwrite(df))
        return
    df.write.mode("overwrite" if mode != "append" else "append").parquet(location)
