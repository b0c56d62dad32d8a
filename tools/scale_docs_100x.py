"""100x scale check for the DEDUP family's linear shipping policies
(round 7; extends r6's 10x table two orders of magnitude).

Tiles sf0.1's documents 100x → 5M docs. Each copy appends a copy token
to the text, so cross-copy EXACT duplicates don't exist and duplicate
DENSITY stays constant (the planted intra-copy dup classes replicate
per copy) — the honest horizontal growth of a crawl corpus. Measures
the queries whose 100 TB story is "linear, one pass / one keyed agg":

- dedup_exact        (digest groupBy, map-side combined)
- dedup_lsh_keep     (the shipping keep-rule: two linear aggregations
                      over the signature table; signatures computed once
                      at ingest — measured here cold = ingest + policy)
- doc_fingerprint    (zero-shuffle 1-perm minhash scan)
- quality_score      (zero-shuffle per-row scoring)
- lang_id            (zero-shuffle per-row n-gram heuristic)

Usage: python tools/scale_docs_100x.py [one_x_dir] [out_dir]
Prints a growth table for SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from debgpt7_8_with_vectordb_spark.plans import QUERIES  # noqa: E402
from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402

COPIES = 100
BATCH = [
    "dedup_exact",
    "dedup_lsh_keep",
    "doc_fingerprint",
    "quality_score",
    "lang_id",
    # round-8 curation head (zero-shuffle scans; curate_crawl's own
    # WARC-shard tile lives in scale_crawl.py)
    "gopher_signals",
    "c4_line_clean",
    "url_normalize",
    # round-9 PSL-backed registrable domains (zero-shuffle Arrow pass;
    # rule sets per executor + host LRU — the LRU is the scale lever on
    # a real crawl where hosts repeat heavily)
    "registrable_domains",
]


def build(spark, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in ("events", "embeddings", "region"):
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.exists(s) and not os.path.exists(d):
            shutil.copyfile(s, d)
    docs = spark.read.parquet(f"{src}/documents.parquet")
    n = docs.count()
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    cols = [c for c in docs.columns if c not in ("doc_id", "text")]
    tiled = docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("copy") * F.lit(n)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" c"), F.col("copy").cast("string")
        ).alias("text"),
        *cols,
    )
    tmp = f"{out}/.docs_build"
    tiled.repartition(64).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(f"{out}/documents.parquet", ignore_errors=True)
    os.replace(tmp, f"{out}/documents.parquet")


def warm_python_workers(spark) -> float:
    """Spin up the full Python worker pool with a trivial Arrow pass
    BEFORE timing: the first wide Arrow stage in a fresh JVM pays ~6 s
    of 32 parallel cold pandas/pyarrow imports (measured r11) — a
    fixed per-executor startup cost, not query work. Without this, the
    tile's first Arrow-backed query (url_normalize, once the cached
    dedup_lsh_keep artifact started skipping its warming ingest)
    recorded 15-30 s walls that were really interpreter startup."""
    t0 = time.time()
    df = spark.range(64 * 1000).repartition(64)

    def ident(batches):
        yield from batches

    df.mapInPandas(ident, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    return time.time() - t0


def main() -> None:
    one_x = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100_docs"
    spark = get_spark(app_name="scale_docs_100x")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"python-worker warmup: {warm_python_workers(spark):.1f}s "
        "(fixed per-executor startup, excluded from query walls)"
    )
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        t0 = time.time()
        build(spark, one_x, out)
        print(f"built 100x docs corpus in {time.time() - t0:.1f}s -> {out}")

    print(f"{'query':>18}   {'1x':>7}   {'100x':>9}   growth")
    for name in BATCH:
        t1 = _run_min(spark, name, one_x, 2)
        # min-of-2 at 100x: this box shows multi-second noisy-neighbor
        # spikes that attach to single runs (r11: a 2 s url_normalize
        # recorded 17 s in one tile pass while gopher_signals' 1x run
        # took 10 s in the same process) — min across runs is the
        # honest steady-state. dedup_lsh_keep stays single-run because
        # its 100x number deliberately measures the COLD ingest.
        runs = 1 if name == "dedup_lsh_keep" else 2
        t100 = _run_min(spark, name, out, runs)
        print(
            f"{name:>18}: {t1:6.2f}s   {t100:8.2f}s   "
            f"{t100 / max(t1, 1e-9):6.2f}x"
        )
    spark.stop()


def _run_min(spark, name: str, sf_dir: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
    return best


if __name__ == "__main__":
    main()
