"""Structured Streaming surface.

The reference's only streaming contract is that its expressions run unchanged
inside Structured Streaming queries (no watermarks / stateful operators
anywhere in the repo; tested by
/root/reference/python/tests/streaming/spark/test_constructor_functions.py:327-336).
This engine inherits that for free — every operator here is a stateless column
transform — and adds the two streaming composites a tile-serving pipeline needs:
per-micro-batch enrichment (cells + tiles) and watermarked windowed tile counts
(an *extension* over the reference, which has no event-time handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_sedona_spark.cells import Grid
from incubator_sedona_spark.operators.tiling import tile_coordinate_cols


def streaming_enrich(
    stream: DataFrame,
    grid: Grid,
    x_col: str,
    y_col: str,
    boundary: tuple[float, float, float, float],
    res: int,
) -> DataFrame:
    """Attach cell id + tile coords to a streaming DataFrame (stateless)."""
    tx, ty = tile_coordinate_cols(F.col(x_col), F.col(y_col), boundary, res, res)
    return (
        stream.withColumn("cell", grid.point_cell_col(F.col(x_col), F.col(y_col)))
        .withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
    )


def streaming_exact_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    timeout_minutes: float | None = 24 * 60,
) -> DataFrame:
    """Custom STATEFUL streaming operator: cross-micro-batch exact dedup.

    applyInPandasWithState keyed by md5(text): the state holds the first-seen
    id per distinct text, so a document whose text already appeared in ANY
    earlier micro-batch is dropped and each first occurrence is emitted
    exactly once.

    State eviction is ON BY DEFAULT with a 24-hour processing-time TTL:
    unbounded state (one row per distinct text forever) is an ever-growing
    state store at 10^12-row pipeline scale.  The dedup-window contract:
    a text is deduplicated against occurrences seen within the last
    ``timeout_minutes`` of processing time SINCE ITS LAST ARRIVAL (the TTL
    re-arms on every occurrence, including dropped duplicates — Spark clears
    a key's timeout on each invocation, so re-arming is also required for
    correctness); a re-arrival after eviction re-emits as a fresh first
    occurrence.  Pass ``timeout_minutes=None`` explicitly for exact
    unbounded dedup when the key space is known to be small.  The reference
    has no stateful operators at all; this is the engine extension the
    training-data pipeline needs for streaming ingest dedup.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.withColumn("__k", F.md5(F.col(text_col)))
    out_schema = f"{id_col} long, {text_col} string"
    state_schema = "seen boolean"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )

    ttl_ms = int(timeout_minutes * 60 * 1000) if timeout_minutes else None

    def _dedup(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        first = rows.sort_values(id_col).iloc[0]
        state.update((True,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({id_col: [first[id_col]], text_col: [first[text_col]]})

    return keyed.groupBy("__k").applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_tile_counts(
    stream: DataFrame,
    grid: Grid,
    x_col: str,
    y_col: str,
    boundary: tuple[float, float, float, float],
    res: int,
    ts_col: str | None = None,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tile-count aggregation over a stream; event-time windowed when ts given."""
    enriched = streaming_enrich(stream, grid, x_col, y_col, boundary, res)
    if ts_col is None:
        return enriched.groupBy("tile_x", "tile_y").agg(F.count("*").alias("cnt"))
    return (
        enriched.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), "tile_x", "tile_y")
        .agg(F.count("*").alias("cnt"))
    )
