"""Uniform cell grid — the engine's spatial shuffle key.

Replaces the reference's driver-built quadtree/KDB partitioners
(/root/reference/core/src/main/java/org/apache/sedona/core/spatialPartitioning/QuadtreePartitioning.java:43-64,
KDB.java:90-235) with a *static* power-of-two grid, equivalent to the
reference's own EQUALGRID mode (SpatialRDD.java:252-261) and its documented
S2-cell join recipe (docs/api/sql/Optimizer.md:152-220): every geometry maps to
the int64 ids of the grid cells its bbox intersects; points map to exactly ONE
cell via half-open ``[min, max)`` assignment — the same single-assignment rule
as StandardQuadTree.placeObject (StandardQuadTree.java:445-466) — which is what
makes point joins duplicate-free with no dedup pass (GeomUtils.java:330-332).

Skew is handled downstream by AQE skew-join splitting plus optional explicit
salting (operators/joins.py), not by a driver-side balanced tree: at 100 TB a
collected sample + broadcast tree is a driver bottleneck, while a static grid
key is computed fully JVM-side by codegen'd expressions.

Cell id packing: ``(level << 58) | (ix << 29) | iy`` — int64, level <= 28,
ix/iy < 2^29.  The (level, ix, iy) triple doubles as the quadkey lineage id
(LineageDecoder analog, viz/.../utils/LineageDecoder.scala).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Global bounds padding, mirroring SpatialRDD.java:245-249 (pad +0.01 so
# max-edge geometries stay inside the grid).
BOUNDARY_PAD = 0.01


@dataclass(frozen=True)
class Grid:
    minx: float
    miny: float
    maxx: float
    maxy: float
    level: int

    @property
    def n(self) -> int:
        return 1 << self.level

    @property
    def cw(self) -> float:
        return (self.maxx - self.minx) / self.n

    @property
    def ch(self) -> float:
        return (self.maxy - self.miny) / self.n

    # -- python/numpy side ---------------------------------------------------
    def pack(self, ix, iy):
        return (np.int64(self.level) << 58) | (np.asarray(ix, dtype=np.int64) << 29) | np.asarray(
            iy, dtype=np.int64
        )

    @staticmethod
    def unpack(cell: int):
        cell = int(cell)
        return (cell >> 58) & 0x3F, (cell >> 29) & ((1 << 29) - 1), cell & ((1 << 29) - 1)

    def point_cells(self, x, y) -> np.ndarray:
        """Single half-open cell assignment per point (vectorized)."""
        ix = np.clip(np.floor((np.asarray(x) - self.minx) / self.cw), 0, self.n - 1).astype(np.int64)
        iy = np.clip(np.floor((np.asarray(y) - self.miny) / self.ch), 0, self.n - 1).astype(np.int64)
        return self.pack(ix, iy)

    def cover_bbox(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        """All cells whose extent intersects the (closed) bbox."""
        ix0 = int(np.clip(np.floor((xmin - self.minx) / self.cw), 0, self.n - 1))
        iy0 = int(np.clip(np.floor((ymin - self.miny) / self.ch), 0, self.n - 1))
        ix1 = int(np.clip(np.floor((xmax - self.minx) / self.cw), 0, self.n - 1))
        iy1 = int(np.clip(np.floor((ymax - self.miny) / self.ch), 0, self.n - 1))
        ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
        iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
        gx, gy = np.meshgrid(ixs, iys, indexing="ij")
        return self.pack(gx.ravel(), gy.ravel())

    def cover_bbox_batch(self, bounds: np.ndarray) -> list:
        """Covering cell-id arrays for an (n, 4) bbox batch (pandas-UDF body)."""
        return [self.cover_bbox(*row) for row in bounds]

    def cell_bounds(self, cell: int):
        _, ix, iy = self.unpack(cell)
        return (
            self.minx + ix * self.cw,
            self.miny + iy * self.ch,
            self.minx + (ix + 1) * self.cw,
            self.miny + (iy + 1) * self.ch,
        )

    def ring_cells(self, cell: int, k: int) -> np.ndarray:
        """Cells at Chebyshev distance exactly k from ``cell`` (kNN expansion)."""
        _, ix, iy = self.unpack(cell)
        out = []
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                if max(abs(dx), abs(dy)) != k:
                    continue
                jx, jy = ix + dx, iy + dy
                if 0 <= jx < self.n and 0 <= jy < self.n:
                    out.append((np.int64(self.level) << 58) | (np.int64(jx) << 29) | np.int64(jy))
        return np.array(out, dtype=np.int64)

    def quadkey(self, cell: int) -> str:
        """Base-4 lineage string for a cell (LineageDecoder analog)."""
        _, ix, iy = self.unpack(cell)
        digits = []
        for b in range(self.level - 1, -1, -1):
            digits.append(str(((ix >> b) & 1) | (((iy >> b) & 1) << 1)))
        return "".join(digits)

    # -- Spark-native (codegen'd, no UDF) expressions -------------------------
    def point_cell_col(self, x: Column, y: Column) -> Column:
        """Half-open single-cell id for point columns, pure Catalyst exprs."""
        ix = F.least(
            F.lit(self.n - 1),
            F.greatest(F.lit(0), F.floor((x - F.lit(self.minx)) / F.lit(self.cw))),
        ).cast("long")
        iy = F.least(
            F.lit(self.n - 1),
            F.greatest(F.lit(0), F.floor((y - F.lit(self.miny)) / F.lit(self.ch))),
        ).cast("long")
        return (
            F.shiftleft(F.lit(self.level).cast("long"), 58)
            .bitwiseOR(F.shiftleft(ix, 29))
            .bitwiseOR(iy)
        )

    def cover_bbox_col(self, xmin: Column, ymin: Column, xmax: Column, ymax: Column) -> Column:
        """array<long> of covering cells for bbox columns — pure Catalyst.

        Built from ``sequence`` x ``transform``/``flatten``: stays JVM-side, so
        polygon cell covering costs no Python round trip.
        """
        def idx(c: Column, lo: float, w: float) -> Column:
            return F.least(
                F.lit(self.n - 1), F.greatest(F.lit(0), F.floor((c - F.lit(lo)) / F.lit(w)))
            ).cast("long")

        ix0, ix1 = idx(xmin, self.minx, self.cw), idx(xmax, self.minx, self.cw)
        iy0, iy1 = idx(ymin, self.miny, self.ch), idx(ymax, self.miny, self.ch)
        lvl = F.shiftleft(F.lit(self.level).cast("long"), 58)
        return F.flatten(
            F.transform(
                F.sequence(ix0, ix1),
                lambda ix: F.transform(
                    F.sequence(iy0, iy1),
                    lambda iy: lvl.bitwiseOR(F.shiftleft(ix, 29)).bitwiseOR(iy),
                ),
            )
        )


def grid_for_bounds(
    minx: float, miny: float, maxx: float, maxy: float, level: int, pad: float = BOUNDARY_PAD
) -> Grid:
    """Grid over padded data bounds (pad per SpatialRDD.java:245-249)."""
    return Grid(minx, miny, maxx + pad, maxy + pad, level)


def choose_level(avg_extent: float, world_extent: float, target_cells_per_geom: float = 4.0) -> int:
    """Pick a grid level so an average geometry covers ~target_cells_per_geom cells.

    Heuristic stand-in for the reference's sampled tree sizing
    (RDDSampleUtils.getSampleNumbers); computable from cheap agg stats
    (avg bbox width) instead of a collected sample.
    """
    if avg_extent <= 0:
        return 12
    cells_per_axis = world_extent / avg_extent * (target_cells_per_geom ** 0.5) / 2.0
    level = int(np.clip(np.ceil(np.log2(max(cells_per_axis, 1.0))), 1, 28))
    return level
