"""Per-query optimization measurement harness (rounds 14-15).

Times each named query standalone against the noop sink (guide §1.4 —
computation only, no sink cost), min-of-N, and optionally captures the
formatted physical plan to plans/<round>/<query>_<tag>.txt (guide §7.2).

Unlike bench.py this is a scratch tool for the optimize/re-measure loop:
it runs a SUBSET of queries, labels jobs (guide §1.5), and prints a
per-query table instead of the driver's one-line contract.

Usage:
  python tools/opt_measure.py [--runs N] [--plans TAG] [--plandir r15]
                              [--sf DIR] query ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="write plans/<plandir>/<q>_<TAG>.txt")
    ap.add_argument("--plandir", default="r15")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    # Duplicate names on the command line would silently overwrite earlier
    # samples in `results` (ADVICE r14): de-duplicate, keeping first order.
    args.queries = list(dict.fromkeys(args.queries))

    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    spark = get_spark(app_name="opt_measure")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py so first-query numbers are comparable
    import pyspark.sql.functions as F  # noqa: F401

    warm = spark.read.parquet(f"{args.sf}/region.parquet")
    warm.groupBy("r_name").count().count()

    def _noop_batch(it):
        yield from it

    warm.mapInPandas(_noop_batch, schema=warm.schema).count()

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.plandir,
    )
    results: dict[str, list[float]] = {}
    for name in args.queries:
        if name not in QUERIES:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = QUERIES[name]
        if args.plans:
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, args.sf)
            # public API (ADVICE r14): capture DataFrame.explain output
            # instead of the private PythonSQLUtils bridge
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        samples = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = samples
        print(f"{name:32s} min={min(samples):7.3f}  runs={samples}", flush=True)
    print("TOTAL(min) %.3f" % sum(min(v) for v in results.values()))
    spark.stop()


if __name__ == "__main__":
    main()
