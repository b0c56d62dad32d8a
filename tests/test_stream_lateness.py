"""Watermark lateness matrix (VERDICT r3 next #7).

The streaming family is oracled on DRAINED feeds, where equality with
batch SQL proves the watermark dropped nothing. These tests prove the
other half of the contract: with a deterministic two-batch fixture
(file source, one file per micro-batch, mtime-ordered), an event that
arrives AFTER the watermark passed its window/session is DROPPED, and
an out-of-order event still inside the watermark is KEPT.

Fixture timeline (T0 = 2024-01-01 00:00 UTC, watermark delay 1h), one
file per micro-batch in mtime order. Spark applies a watermark with TWO
batches of lag relative to the data that produced it (computed from
batches <= N-1 at batch N's commit, applied from batch N+1 — measured
empirically: a late row in the batch right after the clock is still
merged, numRowsDroppedByWatermark=0), so the late row ships two batches
after the clock:

b1: target events at T0..T0+10m.
b2: the CLOCK — T0+6h advances max event time; watermark → T0+5h.
b3: KEPT — out-of-order pair at T0+5h30m (behind the clock, but ahead
    of the watermark line).
b4: LATE — ts = T0+20m, window/session end ≪ T0+5h → DROPPED (the
    per-batch progress metric numRowsDroppedByWatermark reads 1 here).
b5: closer clock at T0+12h so append mode emits everything still open.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

import pytest

TS = "timestamp_ntz"
SCHEMA = (
    f"event_id long, ts {TS}, user_id long, event_type string, "
    "value double, props string"
)


def _t(minutes: float) -> datetime:
    from datetime import timedelta

    return datetime(2024, 1, 1, 0, 0, 0) + timedelta(minutes=minutes)


def _write_batch(spark, rows, out_dir: str, name: str, mtime: int) -> None:
    """One parquet FILE = one micro-batch; mtime orders the batches."""
    import glob
    import tempfile

    df = spark.createDataFrame(rows, SCHEMA)
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(out_dir, name)
    shutil.copyfile(part, dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp)


@pytest.fixture()
def late_feed_dir(spark, tmp_path):
    d = str(tmp_path / "feed")
    os.makedirs(d)
    batches = [
        # b1: the target window/session
        [
            (1, _t(0), 1, "A", 1.0, ""),
            (2, _t(5), 1, "A", 1.0, ""),
            (3, _t(10), 1, "B", 1.0, ""),
        ],
        # b2: the clock — advances max event time to T0+6h
        [(4, _t(360), 9, "C", 1.0, "")],
        # b3: KEPT — out of order vs the clock, ahead of the watermark
        [(6, _t(330), 2, "D", 1.0, ""), (7, _t(335), 2, "D", 1.0, "")],
        # b4: LATE — behind the (now-active) T0+5h watermark
        [(5, _t(20), 1, "A", 1.0, "")],
        # b5: closer clock so append mode emits all remaining windows
        [(8, _t(720), 9, "C", 1.0, "")],
    ]
    for i, rows in enumerate(batches, start=1):
        _write_batch(spark, rows, d, f"b{i}.parquet", mtime=1_000_000 * i)
    return d


def _stream(spark, path):
    from debgpt7_8_with_vectordb_spark.streaming.sessionize import (
        stream_events_from_dir,
    )

    return stream_events_from_dir(spark, path, max_files_per_trigger=1)


def _drain(df, name: str, mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_counts_drop_late_keep_inwatermark(spark, late_feed_dir):
    """windowed_counts_stream (the stream_windowed_topk core): the late
    event must NOT bump its closed window's count; the out-of-order
    in-watermark events must be counted."""
    from debgpt7_8_with_vectordb_spark.streaming.sessionize import (
        windowed_counts_stream,
    )

    counts = windowed_counts_stream(
        _stream(spark, late_feed_dir), window="1 hour", watermark="1 hour"
    )
    _drain(counts, "late_windows", "append")
    rows = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("late_windows").collect()
    }
    # late event 5 (type A, first window) dropped: count stays 2, not 3
    assert rows[(_t(0), "A")] == 2, f"late event counted: {rows}"
    assert rows[(_t(0), "B")] == 1
    # out-of-order but in-watermark events 6/7 kept
    assert rows[(_t(300), "D")] == 2, f"in-watermark events dropped: {rows}"


def test_sessionize_drops_late_keeps_inwatermark(spark, late_feed_dir):
    """sessionize_stream: the late event must not extend or rejoin the
    closed session; the in-watermark session must materialize."""
    from debgpt7_8_with_vectordb_spark.streaming.sessionize import (
        sessionize_stream,
    )

    sess = sessionize_stream(
        _stream(spark, late_feed_dir), gap="30 minutes", watermark="1 hour"
    )
    _drain(sess, "late_sessions", "append")
    by_user = {}
    for r in spark.table("late_sessions").collect():
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: one session of the 3 batch-1 events; late event 5 (T0+20m,
    # inside the session's gap window) is NOT added: n_events stays 3
    assert len(by_user[1]) == 1
    assert by_user[1][0]["n_events"] == 3, f"late event joined session: {by_user}"
    # user 2: the out-of-order in-watermark pair forms its own session
    assert len(by_user[2]) == 1
    assert by_user[2][0]["n_events"] == 2
