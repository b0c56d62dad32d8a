"""Streaming funnel: cross-batch disorder cannot stick.

The adversarial case for an arrival-order stateful funnel: the
clicks/purchases arrive in an EARLIER micro-batch than the signup that
unlocks them. funnel_states recomputes the min-chain from its pruned
candidate frontier each batch, so the drained answer equals the batch
relational definition regardless of the batch split.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from debgpt7_8_with_vectordb_spark.plans import QUERIES

BASE = dt.datetime(2024, 1, 1)


def _write_events_file(path, rows, start_id=0):
    tbl = pa.table(
        {
            "event_id": pa.array(
                range(start_id, start_id + len(rows)), type=pa.int64()
            ),
            "ts": pa.array(
                [
                    None if r[2] is None else BASE + dt.timedelta(hours=r[2])
                    for r in rows
                ],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, path)


def test_stream_funnel_survives_cross_batch_disorder(spark, tmp_path):
    from debgpt7_8_with_vectordb_spark.streaming.sessionize import (
        stream_events_from_dir,
    )
    from debgpt7_8_with_vectordb_spark.streaming.stateful import funnel_states

    d = tmp_path / "feed"
    os.makedirs(d)
    # batch 1 (earlier mtime): the DOWNSTREAM funnel events
    _write_events_file(
        str(d / "b1.parquet"),
        [(1, "click", 2), (1, "purchase", 3), (2, "click", 5)],
    )
    time.sleep(1.1)  # file-source orders batches by mtime
    # batch 2: the signups arrive LATE
    _write_events_file(
        str(d / "b2.parquet"),
        [(1, "signup", 1), (2, "signup", 6)],
        start_id=10,
    )

    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        ev = stream_events_from_dir(spark, str(d), max_files_per_trigger=1)
        st = funnel_states(ev, idle_timeout_ms=None)
        q = (
            st.writeStream.format("memory")
            .queryName("t_funnel_disorder")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    import pyspark.sql.functions as F

    got = {
        r["user_id"]: r["deep"]
        for r in spark.table("t_funnel_disorder")
        .groupBy("user_id")
        .agg(F.max("stage").alias("deep"))
        .collect()
    }
    # user 1: signup@1 < click@2 < purchase@3 — full conversion even
    # though the signup arrived a batch AFTER the click/purchase
    assert got[1] == 3, got
    # user 2: click@5 precedes signup@6 — stage 1 only (strictly-after)
    assert got[2] == 1, got


def test_stream_funnel_drops_null_ts(spark, tmp_path):
    """NULL-ts events can't anchor or advance a chain (round-5 NULL-ts
    convention): a user whose ONLY signup is NULL-ts never enters the
    funnel, and a NULL-ts click doesn't block a real conversion."""
    import pyspark.sql.functions as F

    from debgpt7_8_with_vectordb_spark.streaming.sessionize import (
        stream_events_from_dir,
    )
    from debgpt7_8_with_vectordb_spark.streaming.stateful import funnel_states

    d = tmp_path / "feed_null"
    os.makedirs(d)
    _write_events_file(
        str(d / "b1.parquet"),
        [
            (1, "signup", None),  # user 1's ONLY signup: NULL ts
            (1, "click", 2),
            (2, "signup", 1),
            (2, "click", None),  # NULL click must not satisfy stage 2
            (2, "click", 3),
            (2, "purchase", 4),
        ],
    )

    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        ev = stream_events_from_dir(spark, str(d))
        st = funnel_states(ev, idle_timeout_ms=None)
        q = (
            st.writeStream.format("memory")
            .queryName("t_funnel_nullts")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    got = {
        r["user_id"]: r["deep"]
        for r in spark.table("t_funnel_nullts")
        .groupBy("user_id")
        .agg(F.max("stage").alias("deep"))
        .collect()
    }
    # NULL-ts signup never anchors: user 1 stays at stage 0 (their
    # real click reaches the handler but has nothing to follow) — a
    # stage-0 row adds nothing to any funnel count, matching the batch
    # oracle which drops the user entirely
    assert got.get(1, 0) == 0, got
    assert got[2] == 3, got  # real chain converts past the NULL click


def test_stream_funnel_drain_equals_batch(spark, sf_dir):
    """Drained stream counts == the batch event_funnel on the full feed."""
    batch = {
        r["stage"]: r["users"]
        for r in QUERIES["event_funnel"](spark, sf_dir).collect()
    }
    stream = {
        r["stage"]: r["users"]
        for r in QUERIES["stream_event_funnel"](spark, sf_dir).collect()
    }
    assert stream == batch


# ---------- pure-Python handler properties (no Spark) ----------


class _StubState:
    """Minimal GroupState stand-in for driving the handler directly."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        pass


def _drive(handler, batches, state):
    import pandas as pd

    out = []
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "event_type": [e[0] for e in batch],
                "ts": pd.to_datetime([e[1] for e in batch], unit="us"),
            }
        )
        out.extend(handler((7,), iter([pdf]), state))
    return out


def _batch_stage(events):
    t1 = min((us for et, us in events if et == "signup"), default=None)
    if t1 is None:
        return 0
    t2 = min(
        (us for et, us in events if et == "click" and us > t1), default=None
    )
    if t2 is None:
        return 1
    t3 = min(
        (us for et, us in events if et == "purchase" and us > t2),
        default=None,
    )
    return 2 if t3 is None else 3


def test_funnel_handler_any_batch_split_matches_batch():
    """Hypothesis: for ANY event sequence in ANY batch split, the last
    emitted stage equals the batch min-chain — the frontier-pruning
    correctness claim, exercised far past what one planted feed covers."""
    from hypothesis import given, settings, strategies as st

    from debgpt7_8_with_vectordb_spark.streaming.stateful import (
        _make_update_funnel,
    )

    ev = st.tuples(
        st.sampled_from(["signup", "click", "purchase"]),
        st.integers(min_value=1, max_value=40),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(ev, min_size=0, max_size=14), st.data())
    def run(events, data):
        # random batch split preserving order
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(0, len(events)), max_size=3, unique=True
                )
            )
        )
        batches, prev = [], 0
        for c in [*cuts, len(events)]:
            batches.append(events[prev:c])
            prev = c
        handler = _make_update_funnel(
            ("signup", "click", "purchase"), None
        )
        state = _StubState()
        out = _drive(handler, batches, state)
        assert int(out[-1]["stage"][0]) == _batch_stage(events)

    run()


def test_funnel_handler_timeout_emits_final_and_evicts():
    from debgpt7_8_with_vectordb_spark.streaming.stateful import (
        _make_update_funnel,
    )

    handler = _make_update_funnel(("signup", "click", "purchase"), 1000)
    state = _StubState()
    _drive(handler, [[("signup", 1), ("click", 2)]], state)
    assert state.exists

    timed = _StubState(value=state.get, timed_out=True)
    out = list(handler((7,), iter([]), timed))
    assert timed.removed
    assert len(out) == 1
    assert bool(out[0]["final"][0]) is True
    assert int(out[0]["stage"][0]) == 2
