"""Unit tests for the cell grid (python side; Spark-native exprs tested in test_operators)."""

import numpy as np

from incubator_sedona_spark.cells import Grid, choose_level, grid_for_bounds


G = Grid(0.0, 0.0, 100.0, 100.0, 4)  # 16x16 cells of 6.25


def test_pack_unpack():
    c = G.pack(3, 7)
    assert Grid.unpack(int(c)) == (4, 3, 7)


def test_point_cells_half_open():
    cells = G.point_cells(np.array([0.0, 6.25, 6.24, 100.0]), np.array([0.0, 0.0, 0.0, 0.0]))
    l, ix, iy = zip(*(Grid.unpack(int(c)) for c in cells))
    assert ix == (0, 1, 0, 15)  # 6.25 goes to cell 1 (half-open); 100.0 clamped into last


def test_cover_bbox():
    cells = G.cover_bbox(5.0, 5.0, 7.0, 7.0)  # spans cells (0..1, 0..1)
    assert len(cells) == 4
    cells = G.cover_bbox(1.0, 1.0, 2.0, 2.0)
    assert len(cells) == 1


def test_cell_bounds_and_ring():
    c = int(G.pack(3, 7))
    b = G.cell_bounds(c)
    assert b == (3 * 6.25, 7 * 6.25, 4 * 6.25, 8 * 6.25)
    ring0 = G.ring_cells(c, 0)
    assert ring0.tolist() == [c]
    ring1 = G.ring_cells(c, 1)
    assert len(ring1) == 8
    edge = G.ring_cells(int(G.pack(0, 0)), 1)
    assert len(edge) == 3  # clipped at grid edge


def test_quadkey_lineage():
    assert G.quadkey(int(G.pack(0, 0))) == "0000"
    assert G.quadkey(int(G.pack(15, 15))) == "3333"
    assert len(G.quadkey(int(G.pack(5, 9)))) == 4


def test_grid_for_bounds_pads():
    g = grid_for_bounds(0, 0, 100, 100, 4)
    assert g.maxx == 100.01 and g.maxy == 100.01


def test_choose_level_monotonic():
    assert choose_level(1.0, 100.0) >= choose_level(10.0, 100.0)
    assert 1 <= choose_level(0.001, 360.0) <= 28
