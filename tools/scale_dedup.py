"""10x scale check for the round-3 dedup additions (SCALING.md):

- dedup_recall (full blocked exact truth) vs dedup_recall_sampled
  (deterministic doc_id % 4 truth sample) at 1x and 10x — the sampled
  gate is the 100 TB recipe; this measures what it buys.
- dedup_clusters at 10x with pointer doubling (round 2 measured the
  plain-propagation loop at 340 s on 21.4M edges; the jump adds a
  self-join per round but rounds stay 2-3 on near-clique graphs).
- connected_components on the 10x verified-pair graph PLUS an injected
  4096-node chain — the adversarial shape: plain propagation would need
  4095 rounds; pointer doubling must stay ≤ ~log2 + slack.

Usage: python tools/scale_dedup.py [one_x_dir ten_x_dir]
(builds ten_x_dir via tools/make_scale10.py if missing)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from debgpt7_8_with_vectordb_spark.operators.graph import connected_components  # noqa: E402
from debgpt7_8_with_vectordb_spark.plans import QUERIES  # noqa: E402
from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402


def timed(label: str, fn) -> None:
    t0 = time.time()
    out = fn()
    print(f"{label}: {round(time.time() - t0, 1)}s {out}", flush=True)


def main() -> None:
    one_x = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ten_x = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10"
    spark = get_spark(app_name="scale_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{ten_x}/documents.parquet"):
        from make_scale10 import build

        build(spark, one_x, ten_x)
    spark.read.parquet(f"{one_x}/region.parquet").groupBy("r_name").count().count()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()
        return ""

    for label, d in (("1x", one_x), ("10x", ten_x)):
        timed(f"dedup_recall {label}", lambda d=d: noop(QUERIES["dedup_recall"](spark, d)))
        timed(
            f"dedup_recall_sampled {label}",
            lambda d=d: noop(QUERIES["dedup_recall_sampled"](spark, d)),
        )
    timed("dedup_clusters 10x", lambda: noop(QUERIES["dedup_clusters"](spark, ten_x)))

    # round-3 pipeline + embedding families (embeddings are tiled too)
    for name in (
        "pack_sequences",
        "ngram_lm_score",
        "corpus_mixture",
        "contamination_filter",
        "ann_pq",
        "ann_ivfpq",
        "embedding_neardup",
        "dedup_embedding_clusters",
    ):
        for label, d in (("1x", one_x), ("10x", ten_x)):
            timed(f"{name} {label}", lambda n=name, d=d: noop(QUERIES[n](spark, d)))

    # adversarial chain: verified 10x edges + a 4096-node chain over
    # fresh node ids; rounds must stay logarithmic
    from debgpt7_8_with_vectordb_spark.plans.dedup_queries import (
        dedup_minhash_verified,
    )

    base = int(10e6)
    chain_n = 4096
    chain = spark.range(chain_n - 1).select(
        (F.col("id") + base).alias("src"), (F.col("id") + base + 1).alias("dst")
    )
    pairs = dedup_minhash_verified(spark, ten_x).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    edges = pairs.union(chain)
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = (
        spark.read.parquet(f"{ten_x}/documents.parquet")
        .select("doc_id")
        .union(spark.range(chain_n).select((F.col("id") + base).alias("doc_id")))
    )

    t0 = time.time()
    labels, rounds = connected_components(nodes, sym)
    n_clusters = labels.select("lab").distinct().count()
    print(
        f"cc 10x+4096chain: {round(time.time() - t0, 1)}s rounds={rounds} "
        f"clusters={n_clusters}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
