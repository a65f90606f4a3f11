"""Z-order clustering (partitioning.py): interleave correctness, disjoint
file ranges, and the pruning benefit vs an unclustered layout."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.partitioning import (
    write_zordered,
    zvalue_col,
    zvalue_sql,
)


def _morton_ref(ix: int, iy: int, level: int) -> int:
    z = 0
    for b in range(level):
        z |= ((ix >> b) & 1) << (2 * b)
        z |= ((iy >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(ix, iy) for ix in (0, 1, 5, 170, 255) for iy in (0, 3, 99, 255)]
    df = spark.createDataFrame(rows, "ix long, iy long")
    got = df.select("ix", "iy",
                    zvalue_col(F.col("ix"), F.col("iy"), 8).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["ix"], r["iy"], 8)
    # duckdb twin agrees on the same lattice
    import duckdb

    for ix, iy in rows:
        (zd,) = duckdb.sql("SELECT " + zvalue_sql(str(ix), str(iy), 8)).fetchone()
        assert zd == _morton_ref(ix, iy, 8)


def test_zvalue_level_validation(spark):
    with pytest.raises(ValueError, match="1..31"):
        zvalue_col(F.lit(0), F.lit(0), 0)
    with pytest.raises(ValueError, match="1..31"):
        zvalue_sql("a", "b", 32)


def _file_ranges(path, col):
    import pyarrow.parquet as pq

    out = []
    for fp in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(fp).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == col:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        out.append((min(los), max(his)))
    return out


def test_zordered_layout_prunes_box_queries(spark, tmp_path):
    # 64x64 grid of points, level 6 -> zval in [0, 4095]
    pts = spark.range(4096).select(
        (F.col("id") % 64).alias("ix"), (F.col("id") / 64).cast("long").alias("iy")
    ).select("ix", "iy", zvalue_col(F.col("ix"), F.col("iy"), 6).alias("zval"))

    zpath = str(tmp_path / "zsorted")
    write_zordered(pts, zpath, "zval", 16)
    zranges = _file_ranges(zpath, "zval")
    assert len(zranges) == 16
    # repartitionByRange: file z-ranges are globally disjoint
    for i, (lo1, hi1) in enumerate(zranges):
        for lo2, hi2 in zranges[i + 1:]:
            assert hi1 < lo2 or hi2 < lo1

    upath = str(tmp_path / "unsorted")
    # row-order layout (ix fastest): each file spans nearly the full iy axis
    pts.repartition(16).write.mode("overwrite").parquet(upath)

    # box query: ix,iy both in [16, 31] -> one z-quadrant (zvals 512..1023)
    def touched(path):
        n = 0
        for lo, hi in _file_ranges(path, "iy"):
            if not (hi < 16 or lo > 31):
                n += 1
        return n

    assert touched(zpath) < touched(upath)
    # and the full result is intact either way
    got = (
        spark.read.parquet(zpath)
        .where(F.col("ix").between(16, 31) & F.col("iy").between(16, 31))
        .count()
    )
    assert got == 16 * 16


def test_zordered_iy_stats_are_tight(spark, tmp_path):
    pts = spark.range(4096).select(
        (F.col("id") % 64).alias("ix"), (F.col("id") / 64).cast("long").alias("iy")
    ).select("ix", "iy", zvalue_col(F.col("ix"), F.col("iy"), 6).alias("zval"))
    zpath = str(tmp_path / "ztight")
    write_zordered(pts, zpath, "zval", 16)
    # a z-clustered 16-file layout of a 64x64 lattice keeps each file's iy
    # span near 16 rows (one z-stripe), far below the full 64-row axis
    spans = [hi - lo for lo, hi in _file_ranges(zpath, "iy")]
    assert max(spans) <= 24
