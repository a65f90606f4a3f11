"""Spatial storage layout + skew handling.

- GeoParquet-equivalent storage (SURVEY.md §2.1/§4): instead of a forked
  FileFormat with bbox metadata in the footer
  (/root/reference/sql/spark-3.4/.../GeoParquetFileFormat.scala:233-287), the
  engine stores (xmin, ymin, xmax, ymax, cell) as ordinary columns and sorts by
  cell before writing.  Parquet's native min/max row-group stats over those
  columns then give file/row-group pruning through stock Catalyst pushdown —
  verifiable in .explain() as PushedFilters on the scan.

- Skew salting (SURVEY.md §2.6 — the reference has no skew handling beyond KDB
  balancing): hot cells are split into ``factor`` sub-keys; the other join side
  explodes each hot cell into all sub-keys so the equi-join stays correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.operators.joins import BBOX_COLS, with_bbox


# -- storage layout ------------------------------------------------------------

def write_geo_table(
    df: DataFrame,
    path: str,
    grid: Grid,
    geom_col: str = "wkb",
    sort: bool = True,
) -> None:
    """Write a geometry table with bbox + cell stat columns, clustered by cell.

    Sorting by cell makes each parquet row group spatially tight, so min/max
    stats on the bbox columns prune row groups for any window query.
    """
    out = with_bbox(df, geom_col)
    out = out.withColumn(
        "cell", grid.point_cell_col((F.col("xmin") + F.col("xmax")) / 2.0,
                                    (F.col("ymin") + F.col("ymax")) / 2.0)
    )
    if sort:
        out = out.repartitionByRange(F.col("cell")).sortWithinPartitions("cell")
    out.write.mode("overwrite").parquet(path)


def read_geo_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def bbox_window_filter(xmin: float, ymin: float, xmax: float, ymax: float):
    """Window predicate over the stored bbox columns — plain comparisons that
    Catalyst pushes into the parquet scan (PushedFilters)."""
    return (
        (F.col("xmin") <= xmax)
        & (F.col("xmax") >= xmin)
        & (F.col("ymin") <= ymax)
        & (F.col("ymax") >= ymin)
    )


# -- skew handling ---------------------------------------------------------------

def find_hot_cells(df: DataFrame, cell_col: str = "cell", top_k: int = 16, min_rows: int = 100_000):
    """Driver-side hot-cell detection: one aggregate job, top-k by row count."""
    rows = (
        df.groupBy(cell_col)
        .count()
        .where(F.col("count") >= min_rows)
        .orderBy(F.col("count").desc())
        .limit(top_k)
        .collect()
    )
    return {r[cell_col]: int(r["count"]) for r in rows}


#: column types xxhash64 cannot consume — excluded from the default salt hash
_UNHASHABLE_PREFIXES = ("map<",)


def salt_cells(
    df: DataFrame,
    hot: dict,
    factor: int = 8,
    cell_col: str = "cell",
    explode_side: bool = False,
    salt_col: str = "salt",
    hash_cols: list[str] | None = None,
) -> DataFrame:
    """Salt hot cells into ``factor`` sub-keys; join both sides on
    ``[cell_col, salt_col]``.

    - probe side (``explode_side=False``): each row in a hot cell gets ONE
      deterministic sub-key — ``xxhash64`` of ``hash_cols`` (default: every
      hashable column; MapType columns are skipped, they fail analysis under
      xxhash64) mod ``factor``.
    - build side (``explode_side=True``): each row in a hot cell is replicated
      into ALL sub-keys, so every probe sub-key still meets every build row.

    Limitation: rows that are fully identical on ``hash_cols`` land on the
    same sub-key, so a hot cell dominated by exact-duplicate rows stays
    skewed after salting.  Pass ``hash_cols`` naming a row-id column when the
    table has one (the id spreads duplicates uniformly); or dedup first.

    Equivalent to joining on ``cell`` alone, but the hot cell's work spreads
    over ``factor`` reducers.  AQE's skew-join handles the same problem
    adaptively; explicit salting is for jobs where skew is known up front
    (e.g. from the cell metrics ledger).
    """
    if not hot:
        return df.withColumn(salt_col, F.lit(0))
    hot_lit = F.array(*[F.lit(int(c)).cast("long") for c in hot])
    is_hot = F.array_contains(hot_lit, F.col(cell_col))
    if explode_side:
        salts = F.when(is_hot, F.sequence(F.lit(0), F.lit(factor - 1))).otherwise(
            F.array(F.lit(0))
        )
        return df.withColumn(salt_col, F.explode(salts))
    if hash_cols is None:
        types = dict(df.dtypes)
        # cell_col is constant within a hot cell, so it contributes nothing
        # to spreading that cell's rows — exclude it from the default
        hash_cols = [
            c for c in df.columns
            if c != cell_col and not types[c].startswith(_UNHASHABLE_PREFIXES)
        ]
    if not hash_cols:
        raise ValueError(
            "salt_cells: no hashable columns to derive the probe-side salt "
            "from; pass hash_cols naming at least one non-map column"
        )
    return df.withColumn(
        salt_col,
        F.when(is_hot, F.pmod(F.xxhash64(*hash_cols), F.lit(factor)))
        .otherwise(F.lit(0))
        .cast("int"),
    )


# -- bucketed (co-located) spatial joins -----------------------------------------


def write_bucketed_geo_table(
    df: DataFrame,
    table_name: str,
    grid: Grid,
    n_buckets: int = 32,
    geom_col: str = "wkb",
    point_cols: tuple[str, str] | None = None,
) -> None:
    """Persist a geometry table BUCKETED BY its grid cell (Spark managed
    table): two tables bucketed the same way equi-join on ``cell`` with NO
    shuffle on either side — the co-located-join layout SURVEY.md §2.6 calls
    for at warehouse scale, where re-shuffling 100 TB per join is the
    dominant cost.  Point tables get their single half-open cell; polygon
    tables store one row per covering cell (the same explode the join
    performs, done once at write time instead of per query).
    """
    if point_cols is not None:
        px, py = point_cols
        out = df.withColumn("cell", grid.point_cell_col(F.col(px), F.col(py)))
    else:
        out = with_bbox(df, geom_col)
        out = out.withColumn(
            "cell",
            F.explode(
                grid.cover_bbox_col(
                    F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")
                )
            ),
        )
    (
        out.write.mode("overwrite")
        .bucketBy(n_buckets, "cell")
        .sortBy("cell")
        .saveAsTable(table_name)
    )


def bucketed_cell_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    pair_filter=None,
) -> DataFrame:
    """Cell equi-join of two same-bucketed tables.  With matching bucket
    specs Catalyst plans a SortMergeJoin with ZERO Exchange operators (the
    test asserts this on the physical plan) — candidate generation reads
    co-located buckets directly.  ``pair_filter`` is the refine predicate
    (bbox prefilter / kernel refine) applied after the join."""
    l, r = spark.table(left_table), spark.table(right_table)
    j = l.alias("l").join(r.alias("r"), "cell")
    return j.where(pair_filter) if pair_filter is not None else j


# -- Z-order (Morton) clustering ----------------------------------------------
#
# The 100-TB file-layout lever the snapshot log's manifest pruning and
# parquet's native min/max stats both feed on: interleave the bits of the
# two cell coordinates so that sorting by one long key clusters files
# spatially in BOTH axes at once (the same technique Delta/Iceberg expose
# as OPTIMIZE ZORDER BY; public algorithm — Morton 1966).  A box query then
# overlaps O(perimeter) files instead of O(rows/files) stripes.

def zvalue_col(ix, iy, level: int):
    """Morton-interleave two ``level``-bit cell indices into one long.

    Pure Catalyst bit math (shift/and/or) — whole-stage codegen, no UDF.
    Bit b of ix lands at position 2b, of iy at 2b+1.
    """
    if not 1 <= level <= 31:
        raise ValueError(f"level must be 1..31, got {level}")
    z = F.lit(0).cast("long")
    for b in range(level):
        bx = F.shiftright(ix.cast("long"), b).bitwiseAND(F.lit(1))
        by = F.shiftright(iy.cast("long"), b).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bx, 2 * b)).bitwiseOR(
            F.shiftleft(by, 2 * b + 1)
        )
    return z


def zvalue_sql(ix_expr: str, iy_expr: str, level: int) -> str:
    """The DuckDB twin of ``zvalue_col`` — identical integer bit math, so
    oracle queries replay the interleave exactly."""
    if not 1 <= level <= 31:
        raise ValueError(f"level must be 1..31, got {level}")
    terms = []
    for b in range(level):
        terms.append(f"(((({ix_expr}) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((({iy_expr}) >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: str,
    n_files: int,
) -> None:
    """Cluster a table by an existing z-value column and write parquet.

    ``repartitionByRange`` gives globally DISJOINT z-ranges per file (range
    exchange over a sampled boundary set — one shuffle), and the in-file
    sort keeps row-group stats tight, so both parquet min/max pushdown and
    the snapshot log's manifest pruning skip every file whose z-range
    misses the query box's covering z-ranges."""
    (
        df.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )
