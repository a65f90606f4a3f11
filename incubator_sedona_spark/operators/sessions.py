"""Gap-based sessionization over event streams — native windows only.

The events table (user_id, ts, event_type, value, ...) is the telemetry
side of a training-data platform (ingest monitoring, labeler activity,
serving logs); sessionization is its bread-and-butter rollup.  Two forms
with IDENTICAL semantics:

  * ``sessionize`` (batch): lag + cumulative-sum windows — one shuffle on
    the user key, whole-stage codegen throughout, exactly replayable in
    ANSI SQL (the driver-gate oracle).
  * ``streaming_sessions`` (streaming): Spark's native
    ``F.session_window`` (watermarked, state-store managed) — the
    structured-streaming session operator.

Boundary rule shared by both (locked by the parity test): an event
whose gap from the previous event EXCEEDS gap_seconds starts a new
session; a gap of exactly gap_seconds still extends (Spark's
session_window merges events with diff <= gap, measured — the window end
last+gap is inclusive for the next event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-user gap sessions: (user, session_seq, n_events, t_start,
    t_end, sum_value-free — callers aggregate what they need by joining
    back or extending the agg).  session_seq is 1-based in ts order.

    100-TB shape: one Exchange on user_col feeds both window functions and
    the final aggregation (same key, Catalyst reuses the partitioning);
    per-user data is a sort within the partition.  Skewed power users are
    real but bounded (a user emits events at human/device rate) — the
    standard sessionization layout.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    # Gaps are measured at FULL timestamp precision (sub-second events
    # otherwise diverge from session_window, which never truncates); NTZ
    # routes through LTZ under the engine's pinned UTC session
    # (session.py:42, naive == UTC == DuckDB epoch()).  Both engines
    # compute microseconds / 1e6 in binary double — identical values.
    dsec = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(dsec).over(w)
    new_session = F.when(
        prev.isNull() | (dsec - prev > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = df.withColumn("__new", new_session).withColumn(
        "session_seq",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # reported bounds truncate to whole seconds AFTER the full-precision
    # session assignment (floor(min) == min(floor) for positive epochs)
    return with_sess.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.floor(F.min(dsec)).cast("long").alias("t_start"),
        F.floor(F.max(dsec)).cast("long").alias("t_end"),
    )


def streaming_sessions(
    stream: DataFrame,
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """The same sessions over a stream via the native session_window
    (stateful, watermark-bounded): (user, window.start, window.end -
    gap, n_events).  t_end is the LAST EVENT time (window.end minus the
    gap padding), matching the batch operator's t_end exactly."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("__w"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("__w.start").cast("long").alias("t_start"),
            (F.col("__w.end").cast("long") - gap_seconds).alias("t_end"),
            "n_events",
        )
    )
