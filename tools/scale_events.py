"""10x scale check for the EVENT family (VERDICT r5 next-round #4).

SCALING.md's measured table covered dedup/text/ANN; the event-keyed
operators' skew/state claims were analytical only because the 10x
corpus had no events table. tools/make_scale10.py now tiles events as
10x USERS (each copy = a new user with the same history, ts shifted by
copy seconds) — horizontal growth, the way real event tables grow — and
this tool measures, at 1x (sf0.1) and 10x:

- asof_join            (union + one user window — the 1-shuffle as-of)
- range_join           (bucketed interval equi-join)
- event_funnel         (per-user codegen fold)
- retention_cohorts    (two partial-agg passes + keyed join)
- rolling_user_stats   (trailing range frame per user)
- sessionize_events    (batch gap sessions — window + agg)
- hypertable_rollup    (tumbling rollup)
- sessionize_stream    (streaming session_window drain)
- stream_event_funnel  (stateful applyInPandasWithState drain)

min-of-2 per query (bench.py discipline); prints a growth table for
SCALING.md.

Usage: python tools/scale_events.py [one_x_dir ten_x_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debgpt7_8_with_vectordb_spark.plans import QUERIES  # noqa: E402
from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402

BATCH = [
    "asof_join",
    "range_join",
    "event_funnel",
    "retention_cohorts",
    "rolling_user_stats",
    "sessionize_events",
    "hypertable_rollup",
]
STREAMING = ["sessionize_stream", "stream_event_funnel"]


def time_query(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    one_x = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ten_x = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10"
    if not os.path.exists(os.path.join(ten_x, "events.parquet")):
        subprocess.check_call(
            [sys.executable, "tools/make_scale10.py", one_x, ten_x]
        )
    spark = get_spark(app_name="scale_events")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{one_x}/region.parquet").groupBy("r_name").count().count()

    rows = []
    for name in BATCH + STREAMING:
        runs = 1 if name in STREAMING else 2  # a drain re-runs identically
        t1 = time_query(spark, name, one_x, runs=runs)
        t10 = time_query(spark, name, ten_x, runs=runs)
        rows.append((name, t1, t10))
        print(
            f"{name:>22}: 1x {t1:6.2f}s   10x {t10:6.2f}s   "
            f"growth {t10 / max(t1, 1e-9):5.2f}x",
            flush=True,
        )
    print("\nSCALING.md rows:")
    for name, t1, t10 in rows:
        print(f"| {name} | {t1:.1f} s | {t10:.1f} s |")
    spark.stop()


if __name__ == "__main__":
    main()
