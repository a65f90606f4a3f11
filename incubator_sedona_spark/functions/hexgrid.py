"""Hexagonal cell indexing (H3-analog) — pure Catalyst, no Python in the plan.

The engine's JOIN index is the power-of-two square grid / quadkey
(``cells.py`` — the S2-analog side of the north star's "H3/S2 cells").
This module supplies the H3-style side: a flat hexagonal lattice for
density aggregation, k-ring neighborhoods, and ledger keys.  Hexagons are
the natural cell shape for those jobs because (a) all 6 neighbors are
edge-neighbors at the SAME center distance (a square grid mixes edge and
corner neighbors at two distances, so ring semantics are anisotropic) and
(b) hex cells are the closest-to-circular space fillers, so a "k-ring"
is the best polygonal approximation of a metric disk — the same reasons
Uber's H3 picked hexagons (public H3 docs / Brodsky 2018).

Unlike H3 this lattice is PLANAR (it indexes the engine's planar x/y
space, matching the quadkey grid it complements) and non-hierarchical —
hex lattices have no exact subdivision (H3's aperture-7 parents are
approximate); callers who need multi-resolution roll-ups re-index at a
coarser ``size``, which is one multiply per row, not a tree walk.

Layout: POINTY-TOP hexagons, axial coordinates (q, r), circumradius
``size`` (center-to-vertex).  World <-> axial (Red Blob Games' standard
formulation of the lattice basis):

    qf = (sqrt(3)/3 * x - 1/3 * y) / size
    rf = (2/3 * y) / size
    x  = size * sqrt(3) * (q + r/2)
    y  = size * 3/2 * r

Fractional axial coords are snapped to the containing cell with CUBE
ROUNDING: round each of (x=qf, y=-qf-rf, z=rf) to the nearest integer,
then recompute the coordinate with the largest rounding error from the
other two so x+y+z == 0 stays exact.  ``round`` here is floor(v + 0.5):
pyspark and DuckDB floor() are both IEEE-double floor, so the oracle can
replay the assignment bit-for-bit (java.lang.Math.round semantics, NOT
banker's rounding — ties snap toward +inf, a fixed boundary rule).

All functions return Column expressions built from built-ins only, so
cell assignment runs inside whole-stage codegen at scan speed; at 100 TB
the hex id is computed on the fly per row (zero shuffle) and any groupBy
on it is an ordinary map-side-combine hash aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

# double literals written out so the SQL oracle can use the exact same
# constants (same parse -> same IEEE double -> same floor result)
SQRT3_3 = 0.5773502691896257  # repr(math.sqrt(3) / 3)
ONE_3 = 0.3333333333333333  # repr(1 / 3)
TWO_3 = 0.6666666666666666  # repr(2 / 3)
SQRT3 = 1.7320508075688772  # repr(math.sqrt(3))


def _rnd(v: Column) -> Column:
    """floor(v + 0.5) — the fixed, oracle-replayable rounding rule."""
    return F.floor(v + F.lit(0.5))


def hex_qr_cols(x: Column, y: Column, size: float) -> tuple[Column, Column]:
    """Axial (q, r) bigint columns of the hex cell containing (x, y)."""
    qf = (F.lit(SQRT3_3) * x - F.lit(ONE_3) * y) / F.lit(float(size))
    rf = (F.lit(TWO_3) * y) / F.lit(float(size))
    # cube coords: cx=qf, cz=rf, cy=-cx-cz
    cy = -qf - rf
    rx, ry, rz = _rnd(qf), _rnd(cy), _rnd(rf)
    dx = F.abs(rx.cast("double") - qf)
    dy = F.abs(ry.cast("double") - cy)
    dz = F.abs(rz.cast("double") - rf)
    q = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    r = F.when(~((dx > dy) & (dx > dz)) & ~(dy > dz), -rx - ry).otherwise(rz)
    return q.cast("long"), r.cast("long")


def hex_center_cols(q: Column, r: Column, size: float) -> tuple[Column, Column]:
    """World (x, y) of the cell center for axial (q, r)."""
    s = float(size)
    x = F.lit(s * SQRT3) * (q.cast("double") + r.cast("double") / 2.0)
    y = F.lit(s * 1.5) * r.cast("double")
    return x, y


def hex_cell_id_col(q: Column, r: Column) -> Column:
    """(q, r) packed into one non-negative bigint ledger/partition key.

    31-bit biased fields: valid for |q|, |r| < 2^30 — at size=1 that is a
    lattice ~2e9 cells across, far beyond any planar extent the engine
    indexes — and the packed value stays below 2^62 (never touches the
    int64 sign bit).  The packing is order-preserving per component, so
    range pruning on q survives.
    """
    return F.shiftleft(q + F.lit(1 << 30), 31) + (r + F.lit(1 << 30))


def hex_distance_col(q1: Column, r1: Column, q2: Column, r2: Column) -> Column:
    """Hex lattice distance (minimum number of cell steps) between cells."""
    dq = q1 - q2
    dr = r1 - r2
    return (F.abs(dq) + F.abs(dr) + F.abs(dq + dr)) / F.lit(2)


def hex_disk_offsets(k: int) -> list[tuple[int, int]]:
    """Static (dq, dr) offsets of the k-disk (all cells within distance k),
    center included — 1 + 3k(k+1) offsets, sorted.  k is a plan-time
    constant so the disk is unrolled into the expression (no explode of a
    computed sequence needed for small k)."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    out = [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
    ]
    return sorted(out)


def hex_disk_cells_col(q: Column, r: Column, k: int) -> Column:
    """array<struct<q,r>> of the k-disk around (q, r) — the hex analog of
    the square grid's ring expansion; explode it to build a neighbor join
    key (each cell appears in exactly 1 + 3k(k+1) disks, the replication
    factor of the resulting equi-join)."""
    return F.array(
        *[
            F.struct((q + F.lit(dq)).alias("q"), (r + F.lit(dr)).alias("r"))
            for dq, dr in hex_disk_offsets(k)
        ]
    )


def hex_qr_py(x: float, y: float, size: float) -> tuple[int, int]:
    """Driver-side scalar twin of hex_qr_cols (same literals, same rule) —
    used by tests as an independent implementation path."""
    qf = (SQRT3_3 * x - ONE_3 * y) / size
    rf = (TWO_3 * y) / size
    cy = -qf - rf
    rx, ry, rz = (math.floor(v + 0.5) for v in (qf, cy, rf))
    dx, dy, dz = abs(rx - qf), abs(ry - cy), abs(rz - rf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        ry = -rx - rz
    else:
        rz = -rx - ry
    return int(rx), int(rz)


def hex_qr_sql(x_sql: str, y_sql: str, size: float) -> tuple[str, str]:
    """ANSI-SQL (DuckDB) twins of hex_qr_cols over column expressions —
    same double literals, same operation order, same floor(+0.5) rule, so
    the oracle replays the assignment exactly."""
    s = float(size)
    qf = f"(({SQRT3_3!r} * ({x_sql}) - {ONE_3!r} * ({y_sql})) / {s!r})"
    rf = f"(({TWO_3!r} * ({y_sql})) / {s!r})"
    cy = f"(-{qf} - {rf})"
    rx = f"floor({qf} + 0.5)"
    ry = f"floor({cy} + 0.5)"
    rz = f"floor({rf} + 0.5)"
    dx = f"abs({rx} - {qf})"
    dy = f"abs({ry} - {cy})"
    dz = f"abs({rz} - {rf})"
    big = f"({dx} > {dy} AND {dx} > {dz})"
    q = f"CAST(CASE WHEN {big} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    r = (
        f"CAST(CASE WHEN (NOT {big}) AND NOT ({dy} > {dz}) "
        f"THEN -{rx} - {ry} ELSE {rz} END AS BIGINT)"
    )
    return q, r
