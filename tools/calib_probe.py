"""Standalone box-speed probe — the SAME fixed pure-JVM workload
bench.py stamps as calib_sec, runnable without touching the bench.

Protocol (NOTES bench-box section + VERDICT r12 #2): before recording a
bench, probe until best ≲ 0.8; then run

    SPARK_GRAFT_CALIB_BEST=<best> python bench.py

so the recorded line can self-verify quietness against the session-best
probe (bench.calib_quiet_verdict). Prints one line:

    probes: [a, b, c] best: X
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="calibprobe")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warm-up so the first probe isn't charged startup
    spark.range(100_000_000).selectExpr("sum(id)").collect()

    def once() -> float:
        t0 = time.time()
        spark.range(2_000_000_000).selectExpr("sum(id * 2 + 1)").collect()
        spark.range(4_000_000).selectExpr("id % 1000 AS k").groupBy(
            "k"
        ).count().count()
        return time.time() - t0

    vals = [round(once(), 3) for _ in range(n)]
    print(f"probes: {vals} best: {min(vals)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
