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


def streaming_pack_shards(
    stream: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    id_col: str | None = None,
    n_buckets: int = 64,
    bucket_col: str = "bucket",
    shard_col: str = "shard",
) -> DataFrame:
    """Custom STATEFUL streaming operator: token-budget shard packing over a
    document stream (the streaming form of pipeline/packing.pack_shards_nextfit).

    Keyed by the same cross-engine md5 bucket as the batch op; the state per
    bucket is just ``(current shard, running token total)`` — two numbers, so
    state is bounded by ``n_buckets`` regardless of stream length (no TTL
    needed, unlike dedup state which grows with distinct keys).  Within a
    micro-batch a bucket's rows are packed in ``order_col`` order; across
    micro-batches packing continues greedily from the saved state, which is
    exactly the contract a streaming shard-writer needs: shard ids are
    assigned once, never reshuffled, and a restart resumes from the
    checkpointed state store.  Arrival order across micro-batches is the
    packing order (a stream cannot re-sort history).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    from incubator_sedona_spark.pipeline.packing import hash_bucket_col

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    keyed = stream.withColumn(
        bucket_col, hash_bucket_col(F.col(id_col or order_col), n_buckets)
    )
    out_schema = StructType(
        list(keyed.schema.fields) + [StructField(shard_col, LongType())]
    )
    state_schema = "shard long, running double"

    def _pack(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        s, running = state.get if state.exists else (0, 0.0)
        tokens = rows[token_col].to_numpy("float64")
        shard = tokens.astype("int64")  # right-shaped scratch; overwritten below
        for i, t in enumerate(tokens):
            if running > 0.0 and running + t > budget:
                s, running = s + 1, 0.0
            shard[i] = s
            running += t
        state.update((int(s), float(running)))
        rows[shard_col] = shard
        yield rows

    return keyed.groupBy(bucket_col).applyInPandasWithState(
        _pack,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


def streaming_decontaminate(
    stream: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    mode: str = "clean",
) -> DataFrame:
    """Benchmark decontamination over a document STREAM (stateless).

    The batch operator's plan (pipeline/decontam.decontaminate) is already
    the streaming-legal shape — a broadcast stream-static equi-join on the
    benchmark's distinct n-grams — so this composite reuses the same
    column expressions and only restructures the aggregation-free parts:

      * ``mode="clean"``   -> the incoming rows with contaminated documents
        REMOVED: the filter a training-ingest stream actually deploys.
        An anti-join of the stream against its own hits is stream-stream
        (unsupported), so this mode ships the benchmark grams as ONE
        broadcast collect_set row cross-joined in, and filters row-locally
        with arrays_overlap — no explode of the stream side at all.
      * ``mode="flagged"`` -> (id_col, gram) hit rows.  A document whose
        text REPEATS an offending n-gram emits one row per occurrence
        position (array_distinct collapses repeats within one document
        row-locally, so duplicates only arise if the same doc_id arrives
        in multiple stream rows) — deduplicating across the stream would
        need dropDuplicates state, which grows without bound on an
        unbounded stream; counts roll up downstream under whatever
        watermarked window the caller owns.

    The benchmark side is a static DataFrame, recomputed per micro-batch
    only if unpersisted — pass a cached/broadcastable benchmark (it is
    MBs-scale by nature).  State: NONE in either mode (both are stateless
    row-local projections + a broadcast join), so no watermark is needed
    and state stores stay empty at any stream length.
    """
    from incubator_sedona_spark.pipeline.decontam import ngrams_col

    bench_grams = (
        benchmark.select(
            F.explode(ngrams_col(F.col(bench_text_col or text_col), n)).alias("__gram")
        )
        .distinct()
    )
    if mode == "clean":
        bench_set = bench_grams.agg(F.collect_set("__gram").alias("__bench_grams"))
        # coalesce: NULL text -> NULL gram array -> NULL overlap; such a
        # document has no n-grams, so it is CLEAN (batch parity), not dropped
        overlap = F.coalesce(
            F.arrays_overlap(ngrams_col(F.col(text_col), n), F.col("__bench_grams")),
            F.lit(False),
        )
        return (
            stream.crossJoin(F.broadcast(bench_set))
            .where(~overlap)
            .drop("__bench_grams")
        )
    if mode == "flagged":
        grams = stream.select(
            F.col(id_col),
            F.explode(F.array_distinct(ngrams_col(F.col(text_col), n))).alias("__gram"),
        )
        return grams.join(F.broadcast(bench_grams), "__gram").select(id_col, "__gram")
    raise ValueError(f"mode {mode!r}: clean|flagged")


def streaming_substring_screen(
    stream: DataFrame,
    reference: DataFrame,
    min_len: int = 40,
    k: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
    mode: str = "clean",
) -> DataFrame:
    """Exact-substring screening of a document STREAM against a static
    reference corpus (copyright/leak filtering — the streaming face of
    pipeline/dedup.substring_dup_pairs): a stream document sharing any
    exact substring of >= min_len chars with any reference document is
    flagged (MOSS winnowing guarantee, deterministic recall).

    Same stateless shapes as streaming_decontaminate: ``clean`` filters
    row-locally against the broadcast collect_set of reference
    fingerprints (arrays_overlap, NULL text = clean); ``flagged`` emits
    (id_col, fingerprint) hits via the stream-static equi-join.  State:
    none in either mode.
    """
    from incubator_sedona_spark.pipeline.dedup import winnow_fingerprints

    window = min_len - k + 1
    if window < 1:
        raise ValueError(f"min_len {min_len} must be >= k ({k})")
    ref_fp = reference.select(
        F.explode(
            winnow_fingerprints(F.col(ref_text_col or text_col), k=k, window=window)
        ).alias("__fp")
    )
    if mode == "clean":
        # no .distinct() here: collect_set dedups map-side for free; a
        # pre-distinct would add a redundant Exchange over every
        # reference fingerprint
        ref_set = ref_fp.agg(F.collect_set("__fp").alias("__ref_fps"))
        overlap = F.coalesce(
            F.arrays_overlap(
                winnow_fingerprints(F.col(text_col), k=k, window=window),
                F.col("__ref_fps"),
            ),
            F.lit(False),
        )
        return stream.crossJoin(F.broadcast(ref_set)).where(~overlap).drop("__ref_fps")
    if mode == "flagged":
        fps = stream.select(
            F.col(id_col),
            F.explode(winnow_fingerprints(F.col(text_col), k=k, window=window)).alias("__fp"),
        )
        # the equi-join DOES need distinct reference fingerprints (a
        # repeated reference fingerprint would fan out hits)
        return fps.join(F.broadcast(ref_fp.distinct()), "__fp").select(id_col, "__fp")
    raise ValueError(f"mode {mode!r}: clean|flagged")


def streaming_snapshot_sink(
    stream: DataFrame,
    location: str,
    query_name: str = "snapshot-ingest",
    checkpoint_dir: str | None = None,
    transform=None,
):
    """Commit each microbatch of an image stream as one snapshot-log commit.

    The streaming ingest shape of the north-star table: readStream ->
    (optional transform, e.g. decode/verify/augment) -> ONE snapshot append
    per microbatch through sources/snapshots.py.  Every batch becomes an
    isolated, time-travelable snapshot; a crashed job resumes from the
    streaming checkpoint and re-commits only unprocessed batches (the
    foreachBatch epoch id is recorded in the streaming checkpoint, the
    snapshot log records what actually landed — the two ledgers
    cross-audit).  Readers pinned to an older snapshot never see a
    half-written batch: the version file appears only after the batch's
    data files and manifest are fully durable.

    Returns the configured DataStreamWriter — the caller picks the trigger
    (``.trigger(availableNow=True)`` for backfill, processingTime for
    continuous ingest) and calls ``.start()``.
    """
    from incubator_sedona_spark.sources.iceberg import canonicalize_image_schema
    from incubator_sedona_spark.sources.snapshots import SnapshotTable

    table = SnapshotTable(location)

    def _commit(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch is at-least-once: a crash after table.append but
        # before the streaming checkpoint records the epoch replays this
        # epoch_id on restart.  The snapshot log's commit properties make
        # the append idempotent — an epoch already stamped in a committed
        # snapshot of this query is skipped, so rows never land twice.
        for s in table.snapshots():
            props = s.get("properties", {})
            if props.get("query") == query_name and \
                    props.get("epoch_id") == epoch_id:
                return
        if transform is not None:
            batch_df = transform(batch_df)
        batch_df = canonicalize_image_schema(batch_df)
        if batch_df.isEmpty():
            return
        table.append(batch_df,
                     properties={"query": query_name, "epoch_id": epoch_id})

    writer = stream.writeStream.foreachBatch(_commit).queryName(query_name)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
