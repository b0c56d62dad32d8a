"""Streaming drills at the 100x event tile (VERDICT r7 #7).

The batch event family has measured 100x tiles (scale_events_100x.py);
this tool drains the two state-heaviest STREAMING operators over the
same 10M-event / 150k-user tile and reports what batch numbers cannot:
state-store behavior past the 10x scale — max state rows + state memory
across micro-batches (from StreamingQuery progress), checkpoint size on
disk, rows emitted, and wall growth vs the 1x (sf0.1) drain.

Drills:
- ``sessionize_stream``   — session_window agg (JVM state store),
  complete-mode memory sink, availableNow drain;
- ``stream_event_funnel`` — applyInPandasWithState (Arrow state
  handler), update-mode memory sink.

Both pin shuffle partitions to 8 before first start (the state-store
partition count freezes at checkpoint creation — the catalog queries'
own policy, pipeline_queries.py:307-316).

Usage: python tools/scale_stream_100x.py [one_x_dir] [tile_dir]
Prints a summary block for SCALING.md.
"""

from __future__ import annotations

import itertools
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402

_SEQ = itertools.count()


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _drain(spark, stream_df, mode: str, ckpt_root: str):
    """availableNow drain with an explicit checkpoint; returns (wall_s,
    out_rows, max_state_rows, max_state_mem, ckpt_bytes, n_batches).

    Sink choice is the 100 TB-honest one per mode: append-mode drains
    (watermarked session agg) go to PARQUET — a complete-mode memory
    sink would buffer millions of 100x-tile session rows in the driver
    (measured: OOM) exactly as it would on a real feed; update-mode
    state handlers keep the memory sink (per-user rows, bounded)."""
    name = f"scale_stream_sink_{next(_SEQ)}"
    ckpt = os.path.join(ckpt_root, name)
    t0 = time.time()
    if mode == "append":
        out_dir = os.path.join(ckpt_root, name + "_out")
        q = (
            stream_df.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    else:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    wall = time.time() - t0
    state_rows = state_mem = 0
    batches = 0
    for p in q.recentProgress:
        batches += 1
        for op in p.get("stateOperators", []):
            state_rows = max(state_rows, op.get("numRowsTotal", 0))
            state_mem = max(state_mem, op.get("memoryUsedBytes", 0))
    if mode == "append":
        out_rows = spark.read.parquet(out_dir).count()
    else:
        out_rows = spark.table(name).count()
    return wall, out_rows, state_rows, state_mem, _du(ckpt), batches


def run_drills(spark, sf_dir: str, ckpt_root: str) -> dict:
    from debgpt7_8_with_vectordb_spark.plans.analytics_queries import _FUNNEL
    from debgpt7_8_with_vectordb_spark.streaming.sessionize import (
        sessionize_stream,
        stream_events_from_dir,
    )
    from debgpt7_8_with_vectordb_spark.streaming.stateful import funnel_states

    # testdata keeps events.parquet as one FILE in the sf dir (glob
    # narrows to it); the tile writes it as a Spark parquet DIRECTORY —
    # stream that directory itself, no glob
    ev_path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(ev_path):
        src = lambda: stream_events_from_dir(spark, ev_path)  # noqa: E731
    else:
        src = lambda: stream_events_from_dir(  # noqa: E731
            spark, sf_dir, glob="events.parquet"
        )
    out = {}
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", min(8, int(old_sp)))
    try:
        # append mode: only watermark-finalized sessions emit (the tail
        # past max-event-time - 2h stays in state after a one-shot
        # drain); rows are therefore a floor, wall + state the metric
        sess = sessionize_stream(src(), gap="1 hour", watermark="2 hours")
        out["sessionize_stream"] = _drain(spark, sess, "append", ckpt_root)

        st = funnel_states(src(), funnel=_FUNNEL, idle_timeout_ms=None)
        out["stream_event_funnel"] = _drain(spark, st, "update", ckpt_root)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    return out


def main() -> int:
    one_x = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tile = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_events_100x"
    spark = get_spark(app_name="scale_stream_100x")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(tile, "events.parquet")):
        from tools.scale_events_100x import build

        print(f"building 100x tile at {tile} ...")
        build(spark, one_x, tile)

    n1 = spark.read.parquet(f"{one_x}/events.parquet").count()
    n100 = spark.read.parquet(f"{tile}/events.parquet").count()
    print(f"events: 1x={n1}  tile={n100}  ({n100 / n1:.0f}x)")

    ckpt_root = tempfile.mkdtemp(prefix="scale_stream_ckpt_")
    try:
        print("--- 1x drains")
        r1 = run_drills(spark, one_x, ckpt_root)
        print("--- 100x drains")
        r100 = run_drills(spark, tile, ckpt_root)

        print("\nSCALING.md block:\n")
        print(
            "| stream query | 1x wall | 100x wall | growth | 100x out rows "
            "| max state rows | max state mem | ckpt bytes | batches |"
        )
        print("| --- | --- | --- | --- | --- | --- | --- | --- | --- |")
        for name in r1:
            w1, o1, sr1, sm1, c1, b1 = r1[name]
            w2, o2, sr2, sm2, c2, b2 = r100[name]
            print(
                f"| {name} | {w1:.1f} s | {w2:.1f} s | {w2 / w1:.1f}x "
                f"| {o2} | {sr2} | {sm2 / 1e6:.1f} MB | {c2 / 1e3:.0f} KB "
                f"| {b2} |"
            )
    finally:
        shutil.rmtree(ckpt_root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
