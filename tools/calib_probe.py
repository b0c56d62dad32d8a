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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calib_workload  # noqa: E402  — the ONE workload
from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = max(1, int(sys.argv[1])) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="calibprobe")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warm-up so the first probe isn't charged startup
    spark.range(100_000_000).selectExpr("sum(id)").collect()
    vals = [round(calib_workload(spark), 3) for _ in range(n)]
    print(f"probes: {vals} best: {min(vals)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
