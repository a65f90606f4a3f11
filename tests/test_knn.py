"""kNN query/join vs numpy brute-force oracles (FIXTURES.md F5 pattern;
reference: /root/reference/python/tests/spatial_operator/test_point_knn.py:39-72)."""

import numpy as np

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.operators.knn import knn_join, knn_query


def test_knn_query_matches_argsort(spark):
    rng = np.random.default_rng(11)
    xs, ys = rng.uniform(0, 100, 500), rng.uniform(0, 100, 500)
    qx, qy, k = 42.0, 58.0, 100
    d = np.hypot(xs - qx, ys - qy)
    expected_ids = set(np.argsort(d)[:k].tolist())
    df = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "pid int, x double, y double",
    )
    got = knn_query(df, qx, qy, k, x_col="x", y_col="y", tiebreak=["pid"]).collect()
    assert len(got) == k
    assert {r.pid for r in got} == expected_ids
    dists = [r.dist for r in got]
    assert dists == sorted(dists)


def test_knn_query_wkb_path(spark):
    pts = W.points_to_wkb(np.array([0.0, 3.0, 10.0]), np.array([0.0, 4.0, 0.0]))
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(pts)], "pid int, wkb binary"
    )
    got = knn_query(df, 0.0, 0.0, 2, tiebreak=["pid"]).collect()
    assert [r.pid for r in got] == [0, 1]


def test_knn_join_matches_bruteforce(spark):
    rng = np.random.default_rng(5)
    lx, ly = rng.uniform(0, 100, 60), rng.uniform(0, 100, 60)
    rx, ry = rng.uniform(0, 100, 300), rng.uniform(0, 100, 300)
    k = 5
    left = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(lx, ly))],
        "lid int, x double, y double",
    )
    right = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(rx, ry))],
        "rid int, x double, y double",
    )
    grid = Grid(0.0, 0.0, 100.01, 100.01, 4)
    got = knn_join(left, right, k, grid, left_id="lid").collect()
    by_left = {}
    for r in got:
        by_left.setdefault(r.lid, []).append((r.rid, r.knn_dist))
    d = np.hypot(lx[:, None] - rx[None, :], ly[:, None] - ry[None, :])
    assert len(by_left) == 60
    for li in range(60):
        expected = set(np.argsort(d[li])[:k].tolist())
        gots = {rid for rid, _ in by_left[li]}
        assert len(gots) == k
        # allow tie permutations at the kth boundary: compare distance multisets
        exp_d = sorted(d[li][sorted(expected)])
        got_d = sorted(dd for _, dd in by_left[li])
        assert np.allclose(exp_d, got_d)


def test_knn_join_k_larger_than_matches(spark):
    left = spark.createDataFrame([(0, 1.0, 1.0)], "lid int, x double, y double")
    right = spark.createDataFrame(
        [(0, 2.0, 2.0), (1, 90.0, 90.0)], "rid int, x double, y double"
    )
    grid = Grid(0.0, 0.0, 100.01, 100.01, 3)
    got = knn_join(left, right, 5, grid, left_id="lid").collect()
    assert len(got) == 2  # only 2 exist in total
