"""100x scale check for the ANN family (round 8 — the last core family
without two-orders-of-magnitude evidence; 10x tiles live in SCALING.md).

Tiles sf0.1's embeddings 100x -> 600k vectors. Copies get a small
deterministic per-copy perturbation (seeded arithmetic on the copy
index and dimension) so the tile is not 100 exact duplicates of every
vector — near-duplicate clouds around each original, the honest shape
of a growing embedding corpus.

Measures each query COLD (first run trains + persists the corpus-keyed
artifacts — IVF centroids, SRP planes, PQ codebooks) and WARM (probe
against persisted artifacts), at 1x and 100x. The claims under test:
probes are partition-pruned / shortlist-bounded (sub-linear), encodes
are scans (linear), and nothing curves upward.

Usage: python tools/scale_ann_100x.py [one_x_dir] [out_dir]
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
BATCH = ["ann_ivf", "ann_srp_lsh", "ann_pq", "ann_pq_rerank", "knn_join"]


def build(spark, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in ("documents", "events", "region"):
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.exists(s) and not os.path.exists(d):
            shutil.copyfile(s, d)
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n = emb.count()
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    tiled = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("copy") * F.lit(n)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + ((F.col("copy") * 31 + i) % 7).cast("float") * F.lit(0.003),
        ).alias("embedding"),
        "label",
    )
    tmp = f"{out}/.emb_build"
    tiled.repartition(32).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(f"{out}/embeddings.parquet", ignore_errors=True)
    os.replace(tmp, f"{out}/embeddings.parquet")


def _run(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    one_x = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100_ann"
    spark = get_spark(app_name="scale_ann_100x")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(out, "embeddings.parquet")):
        t0 = time.time()
        build(spark, one_x, out)
        print(f"built 100x embeddings in {time.time() - t0:.1f}s -> {out}")

    print(f"{'query':>16}  {'1x cold':>8} {'1x warm':>8}  "
          f"{'100x cold':>9} {'100x warm':>9}  warm growth")
    for name in BATCH:
        c1 = _run(spark, name, one_x)
        w1 = min(_run(spark, name, one_x), _run(spark, name, one_x))
        c100 = _run(spark, name, out)
        w100 = min(_run(spark, name, out), _run(spark, name, out))
        print(
            f"{name:>16}  {c1:8.2f} {w1:8.2f}  {c100:9.2f} {w100:9.2f}  "
            f"{w100 / max(w1, 1e-9):6.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
