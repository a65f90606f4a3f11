"""Gap sessionization (operators/sessions.py): hand-computed boundaries,
batch/streaming parity (lag+cumsum vs native session_window), and the
driver-gate oracle does the at-scale exact check (event_sessions)."""

import datetime as dt

import pandas as pd
import pytest

from incubator_sedona_spark.operators.sessions import sessionize, streaming_sessions


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=float(sec))


@pytest.fixture()
def events(spark):
    rows = [
        # user 1: 3 events tight, a gap OVER the threshold (1801 s), 2 more
        (1, 1, _ts(0)), (2, 1, _ts(100)), (3, 1, _ts(200)),
        (4, 1, _ts(2001)),  # 1801 s after t=200: > gap -> NEW session
        (5, 1, _ts(2101)),
        # user 2: single event
        (6, 2, _ts(50)),
        # user 3: gap EXACTLY the threshold stays one session (parity rule)
        (7, 3, _ts(0)), (8, 3, _ts(1800)),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    )


def test_sessionize_hand_computed(events):
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.t_start, r.t_end)
        for r in sessionize(events, 1800, tiebreak_col="event_id").collect()
    }
    base = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[(1, 1)] == (3, base, base + 200)
    assert got[(1, 2)] == (2, base + 2001, base + 2101)
    assert got[(2, 1)] == (1, base + 50, base + 50)
    assert got[(3, 1)] == (2, base, base + 1800)  # == gap: still one session
    assert len(got) == 4


def test_streaming_session_window_parity(spark, events, tmp_path):
    """The native session_window stream produces the same sessions
    (count, start, last-event end) as the batch lag/cumsum form."""
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)
    stream = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(src)
    q = (
        streaming_sessions(stream, 1800)
        .writeStream.format("memory").queryName("sess_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream_got = {
        (r.user_id, r.t_start): (r.n_events, r.t_end)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    batch_got = {
        (r.user_id, r.t_start): (r.n_events, r.t_end)
        for r in sessionize(events, 1800, tiebreak_col="event_id").collect()
    }
    assert stream_got == batch_got and len(batch_got) == 4


def test_subsecond_gap_parity(spark, tmp_path):
    """Regression: gaps are measured at full microsecond precision — a
    1800.8 s real gap between events whose TRUNCATED seconds differ by
    exactly 1800 must split in BOTH forms (the truncating batch form
    merged it while session_window split, breaking parity)."""
    rows = [
        (1, 9, _ts(0.1)), (2, 9, _ts(1800.9)),   # real gap 1800.8 > 1800
        (3, 8, _ts(0.1)), (4, 8, _ts(1800.05)),  # real gap 1799.95 <= 1800
    ]
    events = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    )
    batch = {
        (r.user_id, r.t_start): (r.n_events, r.t_end)
        for r in sessionize(events, 1800, tiebreak_col="event_id").collect()
    }
    base = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp())
    assert batch[(9, base)] == (1, base)            # split
    assert batch[(9, base + 1800)] == (1, base + 1800)
    assert batch[(8, base)] == (2, base + 1800)     # merged
    src = str(tmp_path / "subsec_src")
    events.write.parquet(src)
    stream = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(src)
    q = (
        streaming_sessions(stream, 1800)
        .writeStream.format("memory").queryName("subsec_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    stream_got = {
        (r.user_id, r.t_start): (r.n_events, r.t_end)
        for r in spark.sql("SELECT * FROM subsec_out").collect()
    }
    assert stream_got == batch
