"""Storage layout pruning + skew salting + pixelize parity tests."""

import numpy as np
from pyspark.sql import functions as F

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.functions import st as ST
from incubator_sedona_spark.operators.tiling import pixelize
from incubator_sedona_spark.partitioning import (
    bbox_window_filter,
    find_hot_cells,
    read_geo_table,
    salt_cells,
    write_geo_table,
)

GRID = Grid(0.0, 0.0, 100.01, 100.01, 4)


def test_geo_table_roundtrip_and_pushdown(spark, tmp_path):
    rng = np.random.default_rng(4)
    xs, ys = rng.uniform(0, 100, 500), rng.uniform(0, 100, 500)
    df = spark.createDataFrame(
        [(int(i), bytearray(b)) for i, b in enumerate(W.points_to_wkb(xs, ys))],
        "pid int, wkb binary",
    )
    path = str(tmp_path / "geo")
    write_geo_table(df, path, GRID)
    back = read_geo_table(spark, path)
    assert set(back.columns) >= {"pid", "wkb", "xmin", "ymin", "xmax", "ymax", "cell"}
    q = back.where(bbox_window_filter(20.0, 20.0, 40.0, 40.0))
    expected = int(((xs >= 20) & (xs <= 40) & (ys >= 20) & (ys <= 40)).sum())
    assert q.count() == expected
    # the bbox predicate must reach the parquet scan
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "xmin" in plan.split("PushedFilters")[1][:200]


def test_salt_cells_join_equivalence(spark):
    # heavy skew: 5000 rows in one cell, a handful elsewhere
    hot_cell = int(GRID.point_cells(np.array([5.0]), np.array([5.0]))[0])
    probe = spark.range(0, 5000).select(
        F.lit(hot_cell).alias("cell"), F.col("id").alias("pid")
    ).union(
        spark.range(0, 10).select(
            F.lit(int(GRID.point_cells(np.array([50.0]), np.array([50.0]))[0])).alias("cell"),
            (F.col("id") + 10000).alias("pid"),
        )
    )
    build = spark.createDataFrame(
        [(hot_cell, 1), (int(GRID.point_cells(np.array([50.0]), np.array([50.0]))[0]), 2)],
        "cell long, zid int",
    )
    hot = find_hot_cells(probe, min_rows=1000, top_k=4)
    assert hot_cell in hot
    p = salt_cells(probe, hot, factor=4)
    b = salt_cells(build, hot, factor=4, explode_side=True)
    salted = p.join(b, ["cell", "salt"]).count()
    plain = probe.join(build, "cell").count()
    assert salted == plain == 5010
    # build side replicated into all 4 sub-keys for the hot cell only
    assert b.count() == 4 + 1


def test_pixelize_point_and_line(spark):
    B = (0.0, 0.0, 100.0, 100.0)
    pt = spark.createDataFrame(
        [(0, bytearray(W.dumps(W.point(50.0, 50.0))))], "gid int, wkb binary"
    )
    got = pixelize(pt, B, 16, 16).select("pixel_x", "pixel_y").collect()
    assert [(r.pixel_x, r.pixel_y) for r in got] == [(8, 8)]

    # horizontal segment from pixel 0 to pixel 8: Bresenham excludes the end pixel
    ln = spark.createDataFrame(
        [(0, bytearray(W.dumps(W.linestring([(0.0, 50.0), (50.0, 50.0)]))))],
        "gid int, wkb binary",
    )
    got = sorted(
        (r.pixel_x, r.pixel_y) for r in pixelize(ln, B, 16, 16).collect()
    )
    assert got == [(x, 8) for x in range(0, 8)]


def test_pixelize_polygon_outline(spark):
    B = (0.0, 0.0, 100.0, 100.0)
    poly = spark.createDataFrame(
        [(0, bytearray(W.dumps(W.box(0.0, 0.0, 50.0, 50.0))))], "gid int, wkb binary"
    )
    got = {(r.pixel_x, r.pixel_y) for r in pixelize(poly, B, 16, 16).collect()}
    # outline pixels only (edge rasterization, not fill)
    assert (0, 0) in got and (8, 0) in got and (0, 8) in got
    assert (4, 4) not in got  # interior not filled


def test_bucketed_cell_join_has_no_exchange(spark, tmp_path):
    """Co-located layout: two tables bucketed by cell join with ZERO shuffle
    (no Exchange in the physical plan) and produce the same pairs as the
    ordinary cell join path."""
    from incubator_sedona_spark.partitioning import (
        bucketed_cell_join,
        write_bucketed_geo_table,
    )

    import shutil

    for t in ("bkt_pts", "bkt_zones"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    grid = Grid(0.0, 0.0, 100.01, 100.01, 3)
    rng = np.random.default_rng(5)
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 100, (500, 2)))],
        "pid long, x double, y double",
    )
    zones = spark.createDataFrame(
        [(z, (z % 3) * 30.0, (z // 3) * 30.0) for z in range(9)],
        "zid long, x0 double, y0 double",
    ).select(
        "zid",
        F.col("x0").alias("xmin"), F.col("y0").alias("ymin"),
        (F.col("x0") + 25.0).alias("xmax"), (F.col("y0") + 25.0).alias("ymax"),
        ST.st_polygon_from_envelope(
            F.col("x0"), F.col("y0"), F.col("x0") + 25.0, F.col("y0") + 25.0
        ).alias("wkb"),
    )
    write_bucketed_geo_table(pts, "bkt_pts", grid, n_buckets=8, point_cols=("x", "y"))
    write_bucketed_geo_table(zones, "bkt_zones", grid, n_buckets=8)

    inside = (
        (F.col("l.x") >= F.col("r.xmin")) & (F.col("l.x") <= F.col("r.xmax"))
        & (F.col("l.y") >= F.col("r.ymin")) & (F.col("l.y") <= F.col("r.ymax"))
    )
    # force the sort-merge path (tiny test tables auto-broadcast otherwise)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_cell_join(spark, "bkt_pts", "bkt_zones", inside).select(
            "pid", "zid"
        ).dropDuplicates(["pid", "zid"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        # bucketed SMJ: ZERO Exchange between the scans and the join (the
        # dropDuplicates agg above the join may still shuffle)
        assert "SortMergeJoin" in plan
        join_seg = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_seg, join_seg[:800]

        # same pairs as the ordinary engine join
        from incubator_sedona_spark.operators.joins import spatial_join

        expected = {
            (r.pid, r.zid)
            for r in spatial_join(
                zones.select("zid", "wkb"), pts, "covers", grid=grid,
                right_point_cols=("x", "y"),
            ).collect()
        }
        got = {(r.pid, r.zid) for r in j.collect()}
        assert got == expected and len(got) > 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("bkt_pts", "bkt_zones"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
