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


def _parse_nprobes(argv: "list[str]") -> int:
    """Probe count from argv — a non-numeric argument must NOT crash
    before the probe line prints (ADVICE r13 #2): fall back to the
    default of 3 with a usage note on stderr."""
    n = 3
    if len(argv) > 1:
        try:
            n = max(1, int(argv[1]))
        except ValueError:
            print(
                f"usage: calib_probe.py [n_probes]; ignoring "
                f"{argv[1]!r}, using {n}",
                file=sys.stderr,
            )
    return n


def main() -> None:
    n = _parse_nprobes(sys.argv)
    spark = get_spark(app_name="calibprobe")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warm-up so the first probe isn't charged startup
    spark.range(100_000_000).selectExpr("sum(id)").collect()
    vals = [round(calib_workload(spark), 3) for _ in range(n)]
    print(f"probes: {vals} best: {min(vals)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
