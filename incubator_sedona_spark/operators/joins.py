"""Spatial joins as native Spark plans.

This is the engine's equivalent of the reference's join stack
(/root/reference/core/src/main/java/org/apache/sedona/core/spatialOperator/JoinQuery.java:527-581,
sql/common/.../strategy/join/RangeJoinExec.scala:39, DistanceJoinExec.scala:50-84,
BroadcastIndexJoinExec.scala:43-289) — re-planned as the reference's own
documented S2-cell recipe (docs/api/sql/Optimizer.md:152-220):

    cover both sides with grid-cell ids -> explode -> cell equi-join
    -> native bbox prefilter -> vectorized predicate refine (Arrow batch)
    -> reference-point dedup (GeomUtils.java:327-351), expressed columnar.

Catalyst therefore sees a plain equi-join it already knows how to execute
(broadcast-hash or sort-merge, AQE skew splitting, partial aggregation), and
the only Python in the plan is ONE vectorized pandas UDF over the surviving
candidate pairs.  Point sides get a single half-open cell (StandardQuadTree
placeObject analog, StandardQuadTree.java:445-466), so point joins are
duplicate-free with no dedup pass (GeomUtils.java:330-332).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, DoubleType, LongType

from incubator_sedona_spark.cells import Grid, choose_level, grid_for_bounds
from incubator_sedona_spark.geom import kernel as K
from incubator_sedona_spark.geom import wkb as W

BBOX_COLS = ("xmin", "ymin", "xmax", "ymax")
_CELL = "__iss_cell"

_BBOX_OVERLAP = {"intersects", "touches", "overlaps", "crosses", "equals"}
_BBOX_L_CONTAINS_R = {"contains", "covers"}
_BBOX_R_CONTAINS_L = {"within", "coveredby"}


# -- bbox derivation ---------------------------------------------------------

def with_bbox(df: DataFrame, geom_col: str = "wkb", prefix: str = "") -> DataFrame:
    """Attach (xmin, ymin, xmax, ymax) double columns derived from a WKB column.

    One Arrow-batched pandas UDF; vectorized fast path for point batches.
    Skipped entirely when the columns already exist (e.g. stored alongside the
    geometry in parquet — the storage-native analog of GeoParquet's bbox
    metadata, GeoParquetMetaData.scala).
    """
    cols = [prefix + c for c in BBOX_COLS]
    if all(c in df.columns for c in cols):
        return df

    @F.pandas_udf(ArrayType(DoubleType()))
    def _bbox(wkb_s: pd.Series) -> pd.Series:
        bb = W.bounds_batch(wkb_s)
        return pd.Series(list(bb))

    # non-deterministic marker (guide on UDF duplication): the bbox
    # prefilter downstream references these UDF-derived columns, and the
    # optimizer's filter pushdown otherwise plants a SECOND ArrowEvalPython
    # evaluating the same UDF below the filter — every geometry row then
    # pays the WKB parse twice (observed in the flagship plan).  The value
    # is deterministic; the marker only stops the optimizer from cloning it.
    _bbox = _bbox.asNondeterministic()
    df = df.withColumn("__iss_bb", _bbox(F.col(geom_col)))
    for i, c in enumerate(cols):
        df = df.withColumn(c, F.col("__iss_bb")[i])
    return df.drop("__iss_bb")


def infer_grid(
    dfs: Iterable[DataFrame], level: int | None = None, prefix: str = ""
) -> Grid:
    """Derive a Grid from cheap global aggregates over bbox columns.

    Replaces the reference's driver-collected envelope sample + tree build
    (SpatialRDD.java:208-281): two tiny agg jobs instead of shipping a sample
    to the driver — scales to any input size.
    """
    minx = miny = np.inf
    maxx = maxy = -np.inf
    avg_ext = 0.0
    for df in dfs:
        row = df.agg(
            F.min(prefix + "xmin"),
            F.min(prefix + "ymin"),
            F.max(prefix + "xmax"),
            F.max(prefix + "ymax"),
            F.avg(F.col(prefix + "xmax") - F.col(prefix + "xmin")),
            F.avg(F.col(prefix + "ymax") - F.col(prefix + "ymin")),
        ).collect()[0]
        if row[0] is None:
            continue
        minx, miny = min(minx, row[0]), min(miny, row[1])
        maxx, maxy = max(maxx, row[2]), max(maxy, row[3])
        avg_ext = max(avg_ext, max(row[4] or 0.0, row[5] or 0.0))
    if not np.isfinite(minx):
        minx = miny = 0.0
        maxx = maxy = 1.0
    if level is None:
        level = choose_level(avg_ext, max(maxx - minx, maxy - miny))
    return grid_for_bounds(minx, miny, maxx, maxy, level)


# -- internals ---------------------------------------------------------------

def _prefixed(df: DataFrame, prefix: str) -> DataFrame:
    return df.select([F.col(c).alias(prefix + c) for c in df.columns])


def _explode_cells(df: DataFrame, grid: Grid, prefix: str) -> DataFrame:
    """Explode each row into its covering cells — the spatial shuffle key.

    Pure Catalyst expressions (sequence x transform x flatten): no UDF.  A
    degenerate (point) bbox yields exactly one cell, so points are never
    duplicated — the half-open single-assignment contract.
    """
    cover = grid.cover_bbox_col(
        F.col(prefix + "xmin"),
        F.col(prefix + "ymin"),
        F.col(prefix + "xmax"),
        F.col(prefix + "ymax"),
    )
    return df.withColumn(_CELL, F.explode(cover))


def _explode_cells_shape(df: DataFrame, grid: Grid, geom_col: str) -> DataFrame:
    """Shape-following covering: cells the geometry ACTUALLY intersects
    (reference S2 region covering, S2Utils.java:46-52) instead of its bbox.

    One pandas UDF on the (small, usually broadcast) polygon side; a long
    diagonal river/road covers O(length) cells, not O(area) of its bbox, so
    candidate counts stay linear.  Join safety relies on the cover being a
    superset of intersecting cells (cells.Grid.cover_geometry contract).
    """

    @F.pandas_udf(ArrayType(LongType()))
    def _cover(wkbs: pd.Series) -> pd.Series:
        return pd.Series([grid.cover_geometry(W.loads(b)) for b in wkbs])

    return df.withColumn(_CELL, F.explode(_cover(F.col(geom_col))))


def _bbox_prefilter(predicate: str, lp: str, rp: str) -> Column:
    l = {c: F.col(lp + c) for c in BBOX_COLS}
    r = {c: F.col(rp + c) for c in BBOX_COLS}
    if predicate in _BBOX_L_CONTAINS_R:
        return (
            (l["xmin"] <= r["xmin"]) & (l["xmax"] >= r["xmax"])
            & (l["ymin"] <= r["ymin"]) & (l["ymax"] >= r["ymax"])
        )
    if predicate in _BBOX_R_CONTAINS_L:
        return (
            (r["xmin"] <= l["xmin"]) & (r["xmax"] >= l["xmax"])
            & (r["ymin"] <= l["ymin"]) & (r["ymax"] >= l["ymax"])
        )
    return (
        (l["xmin"] <= r["xmax"]) & (r["xmin"] <= l["xmax"])
        & (l["ymin"] <= r["ymax"]) & (r["ymin"] <= l["ymax"])
    )


def _predicate_refine_udf(predicate: str):
    @F.pandas_udf(BooleanType())
    def _refine(lw: pd.Series, rw: pd.Series) -> pd.Series:
        return pd.Series(K.eval_predicate_batch(predicate, lw, rw))

    return _refine


def _rect_refine_xy(predicate: str, lp: str, rx: Column, ry: Column) -> Column:
    """Native refine for AXIS-ALIGNED RECTANGLE left geometries vs point
    coordinates — bit-for-bit the kernel's `_eval_geom_vs_points` semantics
    (point_in_polygon's EPS boundary band incl. the max(len,1)/len
    perpendicular tolerance and the half-open even-odd rule), expressed as
    pure Catalyst comparisons.  The reference has the same specialization
    (RectangleRDD / JoinQuery rectangle windows); here it removes the only
    Python node from rectangle-window point joins."""
    eps = F.lit(float(K._EPS))
    x0, y0 = F.col(lp + "xmin"), F.col(lp + "ymin")
    x1, y1 = F.col(lp + "xmax"), F.col(lp + "ymax")
    w, h = x1 - x0, y1 - y0
    tol_h = eps * F.greatest(w, F.lit(1.0)) / w  # horizontal edges: |dy| band
    tol_v = eps * F.greatest(h, F.lit(1.0)) / h
    near_bt = (
        ((F.abs(ry - y0) <= tol_h) | (F.abs(ry - y1) <= tol_h))
        & (rx >= x0 - eps)
        & (rx <= x1 + eps)
    )
    near_lr = (
        ((F.abs(rx - x0) <= tol_v) | (F.abs(rx - x1) <= tol_v))
        & (ry >= y0 - eps)
        & (ry <= y1 + eps)
    )
    on_bnd = near_bt | near_lr
    # even-odd ray cast of a rectangle: one crossing iff x0 <= px < x1 with
    # the half-open y rule counting the bottom edge in, top edge out
    eo = (rx >= x0) & (rx < x1) & (ry >= y0) & (ry < y1)
    inside = eo & ~on_bnd
    closed = inside | on_bnd
    if predicate == "contains":
        return inside
    if predicate in ("covers", "intersects"):
        return closed
    if predicate == "touches":
        return on_bnd
    # within/coveredby/equals/crosses/overlaps of polygon vs point: False
    return F.lit(False)


# Auto-probing for the rectangle fast path costs one pandas pass over the
# left side; above this row count the probe itself outweighs the win it is
# trying to detect (the fast path targets small window/zone sets joined
# against huge point sides), so auto-detection declines and the kernel
# refine runs.  Callers that KNOW a big left side is all rectangles pass
# left_rect=True explicitly.
RECT_PROBE_MAX_ROWS = 100_000


def _ring_is_rectangle(r: np.ndarray) -> bool:
    """True iff the closed 5-point ring traverses the 4 distinct corners of
    its own bbox in rectangular cyclic order (each consecutive vertex pair
    differs in EXACTLY one coordinate).  The traversal-order check matters:
    a bowtie like (0,0),(1,1),(1,0),(0,1),(0,0) has 2 distinct xs/ys but is
    NOT its bbox — bbox-containment answers would silently diverge from the
    ray-cast kernel (round-3 ADVICE)."""
    if len(r) != 5 or not np.array_equal(r[0], r[-1]):
        return False
    corners = {(float(x), float(y)) for x, y in r[:4]}
    if len(corners) != 4:
        return False
    xs = {c[0] for c in corners}
    ys = {c[1] for c in corners}
    if len(xs) != 2 or len(ys) != 2:
        return False
    for i in range(4):
        dx = r[i + 1, 0] != r[i, 0]
        dy = r[i + 1, 1] != r[i, 1]
        if dx == dy:  # both changed (diagonal) or neither (repeated vertex)
            return False
    return True


def _left_all_rectangles(df: DataFrame, geom_col: str) -> bool:
    """One bounded aggregate: every left geometry is a single axis-aligned
    5-point rectangle ring equal to its own bbox.  Declines (returns False)
    without scanning when the left side exceeds RECT_PROBE_MAX_ROWS — the
    row-cap check is a limit-pushed count, not a full scan."""
    if df.limit(RECT_PROBE_MAX_ROWS + 1).count() > RECT_PROBE_MAX_ROWS:
        return False

    @F.pandas_udf(BooleanType())
    def _is_rect(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            g = W.loads(b)
            ok = (
                g.kind == W.POLYGON
                and len(g.parts) == 1
                and _ring_is_rectangle(g.parts[0][:, :2])
            )
            out.append(bool(ok))
        return pd.Series(out)

    row = df.agg(F.min(_is_rect(F.col(geom_col))).alias("all_rect")).first()
    return bool(row.all_rect)


def _predicate_refine_xy_udf(predicate: str):
    """Refine against raw point coordinates — skips WKB for the point side."""

    @F.pandas_udf(BooleanType())
    def _refine(lw: pd.Series, rx: pd.Series, ry: pd.Series) -> pd.Series:
        pts = np.column_stack([rx.to_numpy(np.float64), ry.to_numpy(np.float64)])
        out = np.zeros(len(lw), dtype=bool)
        groups: dict[bytes, list[int]] = {}
        for i, b in enumerate(lw):
            groups.setdefault(b, []).append(i)
        cache: dict[bytes, W.Geometry] = {}
        for buf, idxs in groups.items():
            g = cache.get(buf)
            if g is None:
                g = W.loads(buf)
                cache[buf] = g
            out[idxs] = K._eval_geom_vs_points(predicate, g, pts[idxs], point_is_left=False)
        return pd.Series(out)

    return _refine


def _dedup_filter(grid: Grid, lp: str, rp: str) -> Column:
    """Reference-point dedup (GeomUtils.isDuplicate, GeomUtils.java:327-351).

    Keep a pair only in the cell containing the bottom-left corner of the bbox
    intersection; pairs where either side is a point are never duplicated
    (points are single-assigned).  Pure Catalyst arithmetic — the dedup costs
    no shuffle, unlike a GROUP BY pair-id dedup.
    """
    l_point = (F.col(lp + "xmin") == F.col(lp + "xmax")) & (
        F.col(lp + "ymin") == F.col(lp + "ymax")
    )
    r_point = (F.col(rp + "xmin") == F.col(rp + "xmax")) & (
        F.col(rp + "ymin") == F.col(rp + "ymax")
    )
    ref_x = F.greatest(F.col(lp + "xmin"), F.col(rp + "xmin"))
    ref_y = F.greatest(F.col(lp + "ymin"), F.col(rp + "ymin"))
    return l_point | r_point | (F.col(_CELL) == grid.point_cell_col(ref_x, ref_y))


_LEFT_ID_HOWS = ("left_semi", "left_anti", "left_outer", "existence")


def _finish_how(
    left: DataFrame, inner: DataFrame, how: str, row_id: str, left_cols: list[str]
) -> DataFrame:
    """Turn inner pair results into semi/anti/outer/existence forms.

    Mirrors BroadcastIndexJoinExec's join-type coverage
    (BroadcastIndexJoinExec.scala:57-71,244) via a matched-id back-join —
    Catalyst plans left_semi/left_anti natively.  ``existence`` returns every
    left row plus a boolean ``exists`` column (the ExistenceJoin output shape).
    """
    if how == "inner":
        return inner.drop(row_id)
    matched = inner.select(row_id).distinct()
    if how == "left_semi":
        return left.join(matched, row_id, "left_semi").drop(row_id)
    if how == "left_anti":
        return left.join(matched, row_id, "left_anti").drop(row_id)
    if how == "left_outer":
        right_cols = [c for c in inner.columns if c not in left_cols and c != row_id]
        return left.join(
            inner.select(row_id, *right_cols), row_id, "left_outer"
        ).drop(row_id)
    if how == "existence":
        return (
            left.join(
                matched.withColumn("__iss_ex", F.lit(True)), row_id, "left_outer"
            )
            .withColumn("exists", F.coalesce(F.col("__iss_ex"), F.lit(False)))
            .drop(row_id, "__iss_ex")
        )
    raise ValueError(f"unsupported how={how!r}")


def _finish_right_outer(
    rgt: DataFrame, inner: DataFrame, row_id: str, rp: str,
    left_cols: list[str], right_cols: list[str],
) -> DataFrame:
    """right_outer: every right row, left columns null where unmatched.

    Output naming matches the inner form (left names first, colliding right
    names suffixed ``_r``) — BroadcastIndexJoinExec.scala:63-65 parity.
    """
    lnames = set(left_cols)
    out_right = [c if c not in lnames else c + "_r" for c in right_cols]
    right_plain = rgt.select(
        *[F.col(rp + c).alias(o) for c, o in zip(right_cols, out_right)],
        F.col(row_id),
    )
    # extras = computed pair columns (e.g. distance_join's emit_distance):
    # carried through like left columns (null on unmatched right rows), so
    # right_outer's output contract matches left_outer's
    extras = [
        c
        for c in inner.columns
        if c != row_id and c not in lnames and c not in set(out_right)
    ]
    pairs_left = inner.select(row_id, *left_cols, *extras)
    res = right_plain.join(pairs_left, row_id, "left_outer")
    return res.select(*left_cols, *out_right, *extras)


# -- public operators ---------------------------------------------------------

def _check_srid_columns(left: DataFrame, right: DataFrame, assume_same_crs: bool) -> None:
    """CRS-mismatch guard (the engine's WKB columns are CRS-less by
    convention; a documented ``srid`` sidecar column opts a DataFrame into
    tracking).  When BOTH sides carry the column, joining sources in
    different CRSs is silent-wrong — so mixed SRIDs raise unless the caller
    passes ``assume_same_crs=True``.  Cost: one min/max aggregate per side,
    only ever paid when both sides opted in (ref: Constructors.java SRID
    plumbing; the reference carries SRID in its serde instead)."""
    if assume_same_crs or "srid" not in left.columns or "srid" not in right.columns:
        return
    ls = left.agg(F.min("srid").alias("lo"), F.max("srid").alias("hi")).first()
    rs = right.agg(F.min("srid").alias("lo"), F.max("srid").alias("hi")).first()
    vals = {v for v in (ls.lo, ls.hi, rs.lo, rs.hi) if v is not None}
    if len(vals) > 1:
        raise ValueError(
            f"spatial join across mixed SRIDs {sorted(vals)}: transform one side "
            "with functions.crs.st_transform, or pass assume_same_crs=True to "
            "override"
        )


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    left_geom: str = "wkb",
    right_geom: str = "wkb",
    grid: Grid | None = None,
    level: int | None = None,
    how: str = "inner",
    broadcast: str | None = None,
    refine: bool = True,
    keep_bbox: bool = False,
    right_point_cols: tuple[str, str] | None = None,
    left_cover: str = "bbox",
    assume_same_crs: bool = False,
    left_rect: bool | str = "auto",
    salt: bool | dict | None = None,
    salt_factor: int = 8,
    salt_min_rows: int = 100_000,
) -> DataFrame:
    """Join two geometry DataFrames on a spatial predicate.

    RangeJoinExec analog (RangeJoinExec.scala:39 + TraitJoinQueryExec.scala:45-143).
    Output = left columns ++ right columns (collisions suffixed ``_r``), inner
    dup contract identical to the reference: each qualifying pair exactly once.

    ``broadcast``: "left"/"right" hints Catalyst to broadcast that (exploded)
    side — the BroadcastIndexJoinExec analog; with AQE + size stats Catalyst
    also auto-broadcasts.  ``how``: inner, left_semi, left_anti, left_outer,
    right_outer, existence.

    ``left_cover="shape"`` replaces the left side's bbox cell cover with a
    shape-following cover (high-aspect geometries stop exploding into their
    whole bbox).  Requires ``right_point_cols`` (single-cell right side keeps
    the pair-uniqueness contract without the reference-point rule, whose
    reference cell may fall outside a shape cover).

    ``salt`` — hot-cell skew handling (the engine's answer to the
    reference's balanced-KDB default partitioner, KDB.java:90-235 /
    SedonaConf.java:75).  ``True``: one cheap count-by-cell pre-aggregate
    over the exploded RIGHT side finds cells above ``salt_min_rows``; those
    cells' right rows get a deterministic sub-key in [0, salt_factor) and
    the left rows covering them replicate into all sub-keys, so the
    equi-join on (cell, salt) is output-identical to the cell join while
    the hot cell's candidate work spreads over ``salt_factor`` reducers.  A
    dict {cell_id: rows} (e.g. from partitioning.find_hot_cells on the
    metrics ledger) skips the pre-aggregate.  Default off: AQE's skew-join
    splitting already re-plans runtime skew for the sort-merge case, and
    broadcast joins (small polygon side — the common shape) never shuffle
    the probe side at all; salting is for the big x big join whose skew is
    known up front, or when AQE is unavailable (e.g. streaming).
    """
    if predicate == "disjoint":
        raise NotImplementedError(
            "disjoint is not cell-joinable (it is the complement of intersects); "
            "use spatial_join(..., 'intersects', how='left_anti')"
        )
    if predicate not in K.PREDICATES:
        raise ValueError(f"unknown predicate {predicate!r}")
    _check_srid_columns(left, right, assume_same_crs)

    if (
        broadcast is None
        and right_point_cols is not None
        and not left.isStreaming
        and not right.isStreaming
    ):
        # A stat-less left side (e.g. a createDataFrame zones table) defeats
        # both Catalyst's auto-broadcast AND AQE's runtime conversion,
        # leaving a SortMergeJoin that shuffles the big point side (observed
        # on the flagship pipeline: both sides Exchange'd for a 200-zone
        # join).  When the optimizer only has the size placeholder, one
        # bounded limit-count decides; a genuinely big left side pays one
        # cheap limit-pushed job and keeps the shuffle plan.  The confirmed-
        # small side is then MATERIALIZED with an eager localCheckpoint: a
        # createDataFrame relation is pickled Python slices that a Python
        # runner re-evaluates on EVERY job over its lineage (the probe, the
        # bbox stage and the broadcast build each paid a full re-evaluation
        # — and coalescing such a relation is poison, serializing all slice
        # evaluations into one task, measured 12-14 s for a 200-row zones
        # table).  The checkpoint cuts the lineage — downstream plans read
        # the materialized rows, keeping any construction UDFs out of the
        # join plan — and the coalesce above it shrinks the pandas-UDF
        # stages (bbox, rectangle probe) to a handful of Arrow tasks
        # instead of one per default partition.
        try:
            est = int(left._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:
            est = 0
        if est >= (1 << 50):
            n_left = left.limit(100_001).count()
            if n_left <= 100_000:
                broadcast = "left"
                left = left.localCheckpoint(eager=True).coalesce(
                    max(1, min(8, 1 + n_left // 2000))
                )

    lp, rp = "l_", "r_"
    lft = _prefixed(with_bbox(left, left_geom), lp)
    if right_point_cols is not None:
        # point side with raw coordinate columns: bbox = (x, y, x, y), fully
        # native — no pandas UDF ever touches the (big) point side
        rx, ry = right_point_cols
        rgt = right
        for c, src in zip(BBOX_COLS, (rx, ry, rx, ry)):
            if c not in rgt.columns:
                rgt = rgt.withColumn(c, F.col(src))
        rgt = _prefixed(rgt, rp)
    else:
        rgt = _prefixed(with_bbox(right, right_geom), rp)
    if grid is None:
        grid = infer_grid(
            [
                lft.select(*[F.col(lp + c).alias(c) for c in BBOX_COLS]),
                rgt.select(*[F.col(rp + c).alias(c) for c in BBOX_COLS]),
            ],
            level=level,
        )

    row_id = "__iss_lid"
    if how in _LEFT_ID_HOWS:
        # persist: the id column must be identical in the pair plan and the
        # back-join plan (monotonically_increasing_id is plan-nondeterministic)
        lft = lft.withColumn(row_id, F.monotonically_increasing_id()).persist()
    elif how == "right_outer":
        rgt = rgt.withColumn(row_id, F.monotonically_increasing_id()).persist()
    elif how != "inner":
        raise ValueError(f"unsupported how={how!r}")

    if left_cover == "shape":
        if right_point_cols is None:
            raise ValueError("left_cover='shape' requires right_point_cols")
        le = _explode_cells_shape(lft, grid, lp + left_geom)
    else:
        le = _explode_cells(lft, grid, lp)
    re = _explode_cells(rgt, grid, rp)
    join_keys: list[str] = [_CELL]
    salt_col = "__iss_salt"
    if salt:
        # lazy import: partitioning imports this module at load time
        from incubator_sedona_spark.partitioning import find_hot_cells, salt_cells

        if isinstance(salt, dict):
            hot = {int(k): int(v) for k, v in salt.items()}
        elif right.isStreaming or left.isStreaming:
            raise ValueError(
                "salt=True detects hot cells with a count pre-aggregate, "
                "which cannot run on a streaming side; pass a dict of hot "
                "cells instead (e.g. from partitioning.find_hot_cells over "
                "the metrics ledger of previous batches)"
            )
        else:
            hot = find_hot_cells(
                re, cell_col=_CELL, top_k=64, min_rows=salt_min_rows
            )
        if hot:
            re = salt_cells(
                re, hot, factor=salt_factor, cell_col=_CELL, salt_col=salt_col
            )
            le = salt_cells(
                le, hot, factor=salt_factor, cell_col=_CELL,
                explode_side=True, salt_col=salt_col,
            )
            join_keys.append(salt_col)

    if broadcast == "left":
        le = F.broadcast(le)
    elif broadcast == "right":
        re = F.broadcast(re)

    cand = le.join(re, join_keys).where(_bbox_prefilter(predicate, lp, rp))
    cand = cand.where(_dedup_filter(grid, lp, rp))
    if refine:
        if right_point_cols is not None:
            # rectangle-window fast path (RectangleRDD analog): when every
            # left geometry is its own bbox, the kernel's polygon-vs-point
            # answer is a pure comparison — zero Python in the whole join
            use_rect = (
                left_rect
                if isinstance(left_rect, bool)
                else (
                    predicate in (
                        "contains", "covers", "intersects", "touches",
                        "within", "coveredby", "equals", "crosses", "overlaps",
                    )
                    and _left_all_rectangles(left, left_geom)
                )
            )
            if use_rect:
                cand = cand.where(
                    _rect_refine_xy(
                        predicate,
                        lp,
                        F.col(rp + right_point_cols[0]),
                        F.col(rp + right_point_cols[1]),
                    )
                )
            else:
                cand = cand.where(
                    _predicate_refine_xy_udf(predicate)(
                        F.col(lp + left_geom),
                        F.col(rp + right_point_cols[0]),
                        F.col(rp + right_point_cols[1]),
                    )
                )
        else:
            cand = cand.where(
                _predicate_refine_udf(predicate)(
                    F.col(lp + left_geom), F.col(rp + right_geom)
                )
            )

    drop = list(join_keys)
    if not keep_bbox:
        for c in BBOX_COLS:
            if c not in left.columns:
                drop.append(lp + c)
            if c not in right.columns:
                drop.append(rp + c)
    inner = cand.drop(*drop)

    # restore caller-facing names (suffix right side on collision)
    out_cols = []
    lcols = [c for c in inner.columns if c.startswith(lp)]
    rcols = [c for c in inner.columns if c.startswith(rp)]
    lnames = {c: c[len(lp):] for c in lcols if c != lp.rstrip("_")}
    for c in lcols:
        if c == row_id:
            continue
        out_cols.append(F.col(c).alias(lnames[c]))
    for c in rcols:
        base = c[len(rp):]
        out_cols.append(F.col(c).alias(base if base not in lnames.values() else base + "_r"))
    if row_id in inner.columns:
        out_cols.append(F.col(row_id))
    inner = inner.select(out_cols)

    if how == "inner":
        return inner
    if how == "right_outer":
        return _finish_right_outer(
            rgt, inner, row_id, rp, list(left.columns), list(right.columns)
        )
    left_plain = lft.select(
        *[F.col(lp + c).alias(c) for c in left.columns], F.col(row_id)
    )
    return _finish_how(left_plain, inner, how, row_id, list(left.columns))


def distance_join(
    left: DataFrame,
    right: DataFrame,
    radius: float | Column | str,
    left_geom: str = "wkb",
    right_geom: str = "wkb",
    grid: Grid | None = None,
    level: int | None = None,
    how: str = "inner",
    broadcast: str | None = None,
    mode: str = "distance",
    include_boundary: bool = True,
    emit_distance: str | None = None,
    left_point_cols: tuple[str, str] | None = None,
    right_point_cols: tuple[str, str] | None = None,
    geography: bool = False,
    salt: bool | dict | None = None,
    salt_factor: int = 8,
    salt_min_rows: int = 100_000,
) -> DataFrame:
    """Join pairs with ST_Distance(left, right) <= radius (or < if not include_boundary).

    ``salt``/``salt_factor``/``salt_min_rows``: hot-cell skew handling,
    identical semantics to :func:`spatial_join`.

    DistanceJoinExec analog (DistanceJoinExec.scala:50-84): the LEFT side's
    envelope is expanded by the radius (TraitJoinQueryBase.scala:51-66) before
    cell covering; the predicate refine is a vectorized distance computation.

    ``mode="circle"`` reproduces the reference's CircleRDD semantics exactly
    (Circle.java:76-81): distance measured from the bbox *center* of the left
    geometry with the radius clamped to at least the half-diagonal of its bbox.
    ``mode="distance"`` (default) is true geometry-to-geometry distance — what
    ST_Distance-based SQL computes.  For point-point inputs the two coincide
    and the refine is pure Catalyst arithmetic (no UDF at all).
    """
    def _side(df: DataFrame, geom: str, pt_cols, prefix: str) -> DataFrame:
        if pt_cols is None:
            return _prefixed(with_bbox(df, geom), prefix)
        x, y = pt_cols
        out = df
        for c, src in zip(BBOX_COLS, (x, y, x, y)):
            if c not in out.columns:
                out = out.withColumn(c, F.col(src))
        return _prefixed(out, prefix)

    lp, rp = "l_", "r_"
    lft = _side(left, left_geom, left_point_cols, lp)
    rgt = _side(right, right_geom, right_point_cols, rp)
    rad = F.lit(float(radius)) if isinstance(radius, (int, float)) else (
        F.col(lp + radius) if isinstance(radius, str) else radius
    )
    lon_scale = F.lit(1.0)
    if geography:
        # geography mode: radius given in METERS; the envelope expansion
        # converts to degrees with the reference's constants — earth radius
        # 6357000 m and a 10% safety fudge (TraitJoinQueryBase.scala:84-97).
        # The LONGITUDE delta must additionally be divided by cos(lat +/-
        # latDelta) (reference expandEnvelope): one degree of longitude spans
        # cos(lat) fewer meters away from the equator, so above ~25 deg the
        # flat 1.1 fudge alone under-expands the bbox and drops true pairs.
        # The refine below then computes haversine distance in meters.
        import math as _math

        meter_rad = rad
        rad = rad / F.lit(6357000.0) * F.lit(180.0 / _math.pi) * F.lit(1.1)
        worst_abs_lat = F.greatest(
            F.abs(F.col(lp + "ymin") - rad), F.abs(F.col(lp + "ymax") + rad)
        )
        lon_scale = F.lit(1.0) / F.cos(F.radians(F.least(worst_abs_lat, F.lit(89.9))))

    if mode == "circle":
        half_diag = (
            F.sqrt(
                F.pow(F.col(lp + "xmax") - F.col(lp + "xmin"), 2)
                + F.pow(F.col(lp + "ymax") - F.col(lp + "ymin"), 2)
            )
            / 2.0
        )
        rad = F.greatest(rad, half_diag)
        cx = (F.col(lp + "xmin") + F.col(lp + "xmax")) / 2.0
        cy = (F.col(lp + "ymin") + F.col(lp + "ymax")) / 2.0
        exp = {
            "xmin": cx - rad * lon_scale,
            "ymin": cy - rad,
            "xmax": cx + rad * lon_scale,
            "ymax": cy + rad,
        }
    else:
        exp = {
            "xmin": F.col(lp + "xmin") - rad * lon_scale,
            "ymin": F.col(lp + "ymin") - rad,
            "xmax": F.col(lp + "xmax") + rad * lon_scale,
            "ymax": F.col(lp + "ymax") + rad,
        }
    lft = lft.withColumn("__iss_rad", rad)
    for c, e in exp.items():
        lft = lft.withColumn("e_" + c, e)

    if grid is None:
        grid = infer_grid(
            [
                lft.select(*[F.col("e_" + c).alias(c) for c in BBOX_COLS]),
                rgt.select(*[F.col(rp + c).alias(c) for c in BBOX_COLS]),
            ],
            level=level,
        )

    row_id = "__iss_lid"
    if how in _LEFT_ID_HOWS:
        lft = lft.withColumn(row_id, F.monotonically_increasing_id()).persist()
    elif how == "right_outer":
        rgt = rgt.withColumn(row_id, F.monotonically_increasing_id()).persist()
    elif how != "inner":
        raise ValueError(f"unsupported how={how!r}")

    le = _explode_cells(lft, grid, "e_")
    re = _explode_cells(rgt, grid, rp)

    join_keys: list[str] = [_CELL]
    salt_col = "__iss_salt"
    if salt:
        from incubator_sedona_spark.partitioning import find_hot_cells, salt_cells

        if isinstance(salt, dict):
            hot = {int(k): int(v) for k, v in salt.items()}
        elif right.isStreaming or left.isStreaming:
            raise ValueError(
                "salt=True needs a count pre-aggregate, impossible on a "
                "streaming side; pass a dict of hot cells instead"
            )
        else:
            hot = find_hot_cells(re, cell_col=_CELL, top_k=64, min_rows=salt_min_rows)
        if hot:
            re = salt_cells(re, hot, factor=salt_factor, cell_col=_CELL, salt_col=salt_col)
            le = salt_cells(
                le, hot, factor=salt_factor, cell_col=_CELL,
                explode_side=True, salt_col=salt_col,
            )
            join_keys.append(salt_col)

    if broadcast == "left":
        le = F.broadcast(le)
    elif broadcast == "right":
        re = F.broadcast(re)

    cand = le.join(re, join_keys).where(_bbox_prefilter("intersects", "e_", rp))
    cand = cand.where(_dedup_filter(grid, "e_", rp))

    l_is_pt = (F.col(lp + "xmin") == F.col(lp + "xmax")) & (
        F.col(lp + "ymin") == F.col(lp + "ymax")
    )
    r_is_pt = (F.col(rp + "xmin") == F.col(rp + "xmax")) & (
        F.col(rp + "ymin") == F.col(rp + "ymax")
    )
    if mode == "circle":
        # distance from left bbox center; exact & native when right is a point
        cx = (F.col(lp + "xmin") + F.col(lp + "xmax")) / 2.0
        cy = (F.col(lp + "ymin") + F.col(lp + "ymax")) / 2.0
        native_dist = F.sqrt(
            F.pow(cx - F.col(rp + "xmin"), 2) + F.pow(cy - F.col(rp + "ymin"), 2)
        )
        dist = F.when(r_is_pt, native_dist).otherwise(
            _distance_udf()(
                F.array(cx, cy).cast(ArrayType(DoubleType())), F.col(rp + right_geom)
            )
        )
    else:
        native_dist = F.sqrt(
            F.pow(F.col(lp + "xmin") - F.col(rp + "xmin"), 2)
            + F.pow(F.col(lp + "ymin") - F.col(rp + "ymin"), 2)
        )
        if geography:
            # haversine meters, pure Catalyst (Haversine.java analog, R=6371008)
            rl1 = F.radians(F.col(lp + "ymin"))
            rl2 = F.radians(F.col(rp + "ymin"))
            dlat = rl2 - rl1
            dlon = F.radians(F.col(rp + "xmin")) - F.radians(F.col(lp + "xmin"))
            hav = F.pow(F.sin(dlat / 2), 2) + F.cos(rl1) * F.cos(rl2) * F.pow(F.sin(dlon / 2), 2)
            native_dist = F.lit(2.0 * 6371008.0) * F.asin(F.sqrt(hav))
            dist = native_dist
        elif left_point_cols is not None and right_point_cols is not None:
            dist = native_dist  # both sides are coordinate points: zero-UDF plan
        else:
            dist = F.when(l_is_pt & r_is_pt, native_dist).otherwise(
                _distance_pair_udf()(F.col(lp + left_geom), F.col(rp + right_geom))
            )
    cand = cand.withColumn("__iss_dist", dist)
    if geography:
        cand = cand.withColumn("__iss_rad", meter_rad)
    cond = (
        F.col("__iss_dist") <= F.col("__iss_rad")
        if include_boundary
        else F.col("__iss_dist") < F.col("__iss_rad")
    )
    cand = cand.where(cond)

    drop = list(join_keys) + ["__iss_rad"] + ["e_" + c for c in BBOX_COLS]
    for c in BBOX_COLS:
        if c not in left.columns:
            drop.append(lp + c)
        if c not in right.columns:
            drop.append(rp + c)
    inner = cand.drop(*drop)

    out_cols = []
    lnames = set()
    for c in inner.columns:
        if c == row_id or c == "__iss_dist":
            continue
        if c.startswith(lp):
            out_cols.append(F.col(c).alias(c[len(lp):]))
            lnames.add(c[len(lp):])
    for c in inner.columns:
        if c.startswith(rp):
            base = c[len(rp):]
            out_cols.append(F.col(c).alias(base if base not in lnames else base + "_r"))
    if emit_distance:
        out_cols.append(F.col("__iss_dist").alias(emit_distance))
    if row_id in inner.columns:
        out_cols.append(F.col(row_id))
    inner = inner.select(out_cols)

    if how == "inner":
        return inner
    if how == "right_outer":
        return _finish_right_outer(
            rgt, inner, row_id, rp, list(left.columns), list(right.columns)
        )
    left_plain = lft.select(*[F.col(lp + c).alias(c) for c in left.columns], F.col(row_id))
    return _finish_how(left_plain, inner, how, row_id, list(left.columns))


def _distance_pair_udf():
    @F.pandas_udf(DoubleType())
    def _d(lw: pd.Series, rw: pd.Series) -> pd.Series:
        return pd.Series(K.distance_batch(lw, rw))

    return _d


def _distance_udf():
    @F.pandas_udf(DoubleType())
    def _d(center: pd.Series, rw: pd.Series) -> pd.Series:
        out = np.empty(len(rw))
        cache: dict[bytes, W.Geometry] = {}
        for i, (c, b) in enumerate(zip(center, rw)):
            g = cache.get(b)
            if g is None:
                g = W.loads(b)
                cache[b] = g
            out[i] = K.distance_pair(W.point(c[0], c[1]), g)
        return pd.Series(out)

    return _d


def range_query(
    df: DataFrame,
    window_wkb: bytes,
    predicate: str = "intersects",
    geom_col: str = "wkb",
    invert_args: bool = False,
) -> DataFrame:
    """Filter rows by a literal query window.

    RangeQuery.SpatialRangeQuery analog (RangeQuery.java:53-94): a native bbox
    prefilter (pushed to the parquet scan when bbox columns are stored) plus a
    vectorized refine against the constant window.  ``predicate(geom, window)``
    unless ``invert_args``.
    """
    g = W.loads(window_wkb)
    wxmin, wymin, wxmax, wymax = g.bounds
    out = with_bbox(df, geom_col)
    pred = K.INVERSE[predicate] if invert_args else predicate
    # bbox prefilter in the window's frame: window as "right" argument
    if pred in _BBOX_L_CONTAINS_R:  # geom contains window
        pre = (
            (F.col("xmin") <= wxmin) & (F.col("xmax") >= wxmax)
            & (F.col("ymin") <= wymin) & (F.col("ymax") >= wymax)
        )
    elif pred in _BBOX_R_CONTAINS_L:  # geom within window
        pre = (
            (F.col("xmin") >= wxmin) & (F.col("xmax") <= wxmax)
            & (F.col("ymin") >= wymin) & (F.col("ymax") <= wymax)
        )
    else:
        pre = (
            (F.col("xmin") <= wxmax) & (F.col("xmax") >= wxmin)
            & (F.col("ymin") <= wymax) & (F.col("ymax") >= wymin)
        )
    out = out.where(pre)

    @F.pandas_udf(BooleanType())
    def _refine(wkb_s: pd.Series) -> pd.Series:
        win = [window_wkb] * len(wkb_s)
        if invert_args:
            return pd.Series(K.eval_predicate_batch(predicate, win, wkb_s))
        return pd.Series(K.eval_predicate_batch(predicate, wkb_s, win))

    out = out.where(_refine(F.col(geom_col)))
    return out.select(df.columns)
