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
                [BASE + dt.timedelta(hours=r[2]) for r in rows],
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
