"""100x scale check for the EVENT family (VERDICT r6 next-round #7).

r6's 10x events tiling measured 1.9-2.2x growth for the one-shuffle
event operators; this tool pushes the same family to 100x (10M events,
150k users from sf0.1's 100k/1.5k) — past the point where a per-user
pathology or an accidental O(n^2) would dominate — and reports, per
query, wall growth AND per-stage task skew (median vs max task ms from
the Spark event log; straggler = max > 4x median on stages with >= 8
tasks and median >= 20 ms).

Tiling is horizontal (each copy = new users with the same history,
ts shifted by copy seconds) — the way real event tables grow; per-user
state and windows stay constant-size, so linear wall growth with flat
skew is the claim being tested.

Usage: python tools/scale_events_100x.py [one_x_dir] [out_dir]
Prints a summary block for SCALING.md.
"""

from __future__ import annotations

import glob as globmod
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from debgpt7_8_with_vectordb_spark.plans import QUERIES  # noqa: E402
from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402

COPIES = 100
EVENT_DIR = "/tmp/spark_events_100x"
BATCH = [
    "event_funnel",
    "rolling_user_stats",
    "asof_join",
    "sessionize_events",
    "hypertable_rollup",
]


def build(spark, src: str, out: str) -> None:
    """Tile events 100x as new users; copy the other tables unchanged
    (the event family reads only events, but the loader wants the dir
    to look like a corpus)."""
    os.makedirs(out, exist_ok=True)
    for t in ("documents", "embeddings", "region"):
        s = f"{src}/{t}.parquet"
        d = f"{out}/{t}.parquet"
        if os.path.exists(s) and not os.path.exists(d):
            shutil.copyfile(s, d)

    ev = spark.read.parquet(f"{src}/events.parquet")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.count()
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    tiled = (
        ev.crossJoin(F.broadcast(copies))
        .select(
            (F.col("event_id") + F.col("copy") * F.lit(n_events)).alias(
                "event_id"
            ),
            (
                F.col("ts")
                + F.make_interval(secs=F.col("copy").cast("double"))
            ).alias("ts")
            if dict(ev.dtypes)["ts"].startswith("timestamp")
            else (F.col("ts") + F.col("copy") * F.lit(1_000_000_000)).alias(
                "ts"
            ),
            (F.col("user_id") + F.col("copy") * F.lit(n_users)).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        )
    )
    tmp = f"{out}/.events_build"
    tiled.repartition(32).write.mode("overwrite").parquet(tmp)
    # single-file layout is NOT needed for batch queries (only the
    # streaming glob cares); keep the directory as events.parquet/
    shutil.rmtree(f"{out}/events.parquet", ignore_errors=True)
    os.replace(tmp, f"{out}/events.parquet")


def task_skew(app_id: str, t_from: float, t_to: float):
    """(n_tasks, median_ms, max_ms, name) per stage completed in the
    window, from the event-log JSON."""
    paths = [
        p
        for p in globmod.glob(os.path.join(EVENT_DIR, f"*{app_id}*"))
        + globmod.glob(os.path.join(EVENT_DIR, f"*{app_id}*", "events*"))
        if os.path.isfile(p) and not p.endswith(".zstd")
    ]
    durs: dict[int, list[float]] = {}
    names: dict[int, str] = {}
    window: set[int] = set()
    for p in paths:
        with open(p) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info", {})
                    d = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                    durs.setdefault(ev.get("Stage ID", -1), []).append(d)
                elif ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info", {})
                    sid = si.get("Stage ID", -1)
                    names[sid] = si.get("Stage Name", "")
                    ct = si.get("Completion Time", 0) / 1000.0
                    if t_from <= ct <= t_to:
                        window.add(sid)
    out = []
    for sid in sorted(window):
        ds = durs.get(sid, [])
        if len(ds) >= 8 and statistics.median(ds) >= 20:
            out.append(
                (len(ds), statistics.median(ds), max(ds), names.get(sid, ""))
            )
    return out


def main() -> None:
    one_x = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100_events"
    os.makedirs(EVENT_DIR, exist_ok=True)
    spark = get_spark(
        app_name="scale_events_100x",
        extra_confs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENT_DIR,
            # plain JSON lines — the default zstd rolling files would
            # need a zstd reader just to grep task times
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    if not os.path.exists(os.path.join(out, "events.parquet")):
        t0 = time.time()
        build(spark, one_x, out)
        print(f"built 100x corpus in {time.time() - t0:.1f}s -> {out}")

    print(f"{'query':>22}   {'1x':>7}   {'100x':>8}   growth")
    results = []
    for name in BATCH:
        best1 = min(
            _run(spark, name, one_x) for _ in range(2)
        )
        t_from = time.time()
        best100 = min(_run(spark, name, out) for _ in range(2))
        t_to = time.time()
        results.append((name, best1, best100, t_from, t_to))
        print(
            f"{name:>22}: {best1:6.2f}s   {best100:7.2f}s   "
            f"{best100 / max(best1, 1e-9):6.2f}x"
        )
    # the event log finalizes on stop — parse skew afterwards
    spark.stop()
    print("\nstage skew detail (100x runs; straggler = max > 4x median):")
    for name, _, _, t_from, t_to in results:
        skew = task_skew(app_id, t_from, t_to)
        worst = max((mx / med for _, med, mx, _ in skew), default=0.0)
        print(f"  {name}: worst max/median {worst:.1f}x over {len(skew)} stages")
        for n, med, mx, sname in skew:
            flag = "  <-- STRAGGLER" if mx > 4 * med else ""
            print(
                f"    tasks={n:>3} median={med:.0f}ms "
                f"max={mx:.0f}ms{flag}  {sname[:60]}"
            )


def _run(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


if __name__ == "__main__":
    main()
