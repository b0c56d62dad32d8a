"""VERDICT r9 #4: MEASURE a JVM-side packing variant of compact_reduce
before building anything.

compact_reduce's 100x growth (17x wall) comes from 19 per-round Spark
jobs, each round-tripping the full surviving volume through an
applyInPandas pack (Arrow serialize both ways) after the rn shuffle.
The candidate replaces ONLY the Python crossing with a whole-stage
F.aggregate fold per rn//4096 block — identical semantics (first-fit
sequential scan, min-2 groups, sizes exclude the separator, exactly
binpack.pack_sizes), identical shuffles, zero Python workers:

  collect_list(struct(rn, ...)) per block -> array_sort
  -> fold sizes to gids (cheap int-array aggregate)
  -> group boundary indices -> one array_join per group (linear bytes)

This tool proves byte-exactness against the production operator at
sf0.01, then times both at the 1x (sf0.1) and 100x tiles. Decision
criterion from the verdict: promote only on a >=1.5x win, else record
the measurement in SCALING.md and close the item permanently.

Usage: python tools/measure_compact_jvm.py [one_x_dir] [hundred_x_dir]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402

from debgpt7_8_with_vectordb_spark.operators.chunker import (  # noqa: E402
    chunk_documents,
)
from debgpt7_8_with_vectordb_spark.operators.mapreduce import (  # noqa: E402
    _PACK_BLOCK_ROWS,
    _checkpoint_rdd_id,
    _unpersist_rdds,
    _with_global_rn,
    compact_reduce,
    map_phase,
)
from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402
from debgpt7_8_with_vectordb_spark.tables import load_table  # noqa: E402
from tools.scale_mapreduce_100x import build  # noqa: E402


def _pack_blocks_jvm(
    blocks: DataFrame, max_group_bytes: int, combine: str
) -> DataFrame:
    """Pack sorted blocks (array<struct<rn,doc_id,start,val>> in column
    ``xs``) into groups — the exact pack_sizes scan as JVM folds.

    EXPRESSION-HYGIENE NOTE (the round-6 jaccard blowup class, hit
    again here on the first cut): the gids fold must be MATERIALIZED as
    its own projection column before anything references it — a lambda
    body re-evaluates its subexpressions PER ELEMENT, so an inline
    ``element_at(<fold>, i)`` inside the boundary filter re-runs the
    whole O(n) fold n times (observed: a single 4096-row block pegged
    one core for 25+ minutes). Chained selects keep each expensive
    expression single-evaluation; CollapseProject does not re-inline
    non-cheap aliases referenced more than once."""
    xs = F.col("xs")
    sizes = F.transform(
        xs, lambda x: F.octet_length(F.coalesce(x["val"], F.lit(""))).cast("long")
    )
    # first-fit gids: fold (gid, cur_bytes, cur_count, out_gids)
    init = F.struct(
        F.lit(0).alias("gid"),
        F.lit(0).cast("long").alias("bytes"),
        F.lit(0).alias("cnt"),
        F.array().cast("array<int>").alias("gids"),
    )

    def step(acc, sz):
        roll = (
            (acc["cnt"] > 0)
            & ((acc["bytes"] + sz) > max_group_bytes)
            & (acc["cnt"] >= 2)
        )
        gid = F.when(roll, acc["gid"] + 1).otherwise(acc["gid"])
        return F.struct(
            gid.alias("gid"),
            (F.when(roll, F.lit(0).cast("long")).otherwise(acc["bytes"]) + sz).alias("bytes"),
            (F.when(roll, F.lit(0)).otherwise(acc["cnt"]) + 1).alias("cnt"),
            F.array_append(acc["gids"], gid).alias("gids"),
        )

    with_gids = blocks.select(
        "xs", F.aggregate(sizes, init, step, lambda acc: acc["gids"]).alias("gids")
    )
    # group start indices: i where gids[i] != gids[i-1] (gids is now a
    # bound column — the lambda reads an attribute, not the fold)
    gids = F.col("gids")
    with_starts = with_gids.select(
        "xs",
        F.filter(
            F.sequence(F.lit(0), F.size(xs) - 1),
            lambda i: (i == 0)
            | (F.element_at(gids, i + 1) != F.element_at(gids, i)),
        ).alias("starts"),
    )
    starts = F.col("starts")
    with_bounds = with_starts.select(
        "xs",
        "starts",
        F.concat(
            F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
            F.array(F.size(xs)),
        ).alias("ends"),
    )
    groups = F.zip_with(
        F.col("starts"),
        F.col("ends"),
        lambda lo, hi: F.struct(
            F.element_at(xs, lo + 1)["doc_id"].alias("doc_id"),
            F.element_at(xs, lo + 1)["start"].alias("start"),
            F.array_join(
                F.transform(
                    F.slice(xs, lo + 1, hi - lo),
                    lambda x: F.coalesce(x["val"], F.lit("")),
                ),
                combine,
            ).alias("val"),
        ),
    )
    return (
        with_bounds.select(F.explode(groups).alias("g"))
        .select("g.doc_id", "g.start", "g.val")
    )


def compact_reduce_jvm(
    mapped: DataFrame,
    max_group_bytes: int,
    combine: str = "\n",
    max_rounds: int | None = None,
) -> tuple[DataFrame, int]:
    """compact_reduce with the Python pack replaced by the JVM fold —
    same per-round loop, same rn blocks, same checkpoints."""
    df = mapped.select("doc_id", "start", "val")
    n = df.count()
    rounds = 0
    limit = max_rounds if max_rounds is not None else max(1, int(math.log2(max(n, 2))) + 2)
    spark = mapped.sparkSession
    prev_ids: set[int] = set()
    while n > 1 and rounds < limit:
        if n <= _PACK_BLOCK_ROWS:
            keyed = _with_global_rn(df, ["doc_id", "start"], n).withColumn(
                "block", F.lit(0).cast("long")
            )
        else:
            keyed = _with_global_rn(df, ["doc_id", "start"], n).withColumn(
                "block", (F.col("rn") / _PACK_BLOCK_ROWS).cast("long")
            )
        blocks = keyed.groupBy("block").agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "doc_id", "start", "val"))
            ).alias("xs")
        )
        df = _pack_blocks_jvm(blocks, max_group_bytes, combine).localCheckpoint(
            eager=True
        )
        n = df.count()
        rounds += 1
        _unpersist_rdds(spark, prev_ids)
        prev_ids = {_checkpoint_rdd_id(df)} - {None}
    return df, rounds


def digest(df: DataFrame) -> str:
    rows = df.orderBy("doc_id", "start").collect()
    h = hashlib.md5()
    for r in rows:
        h.update(f"{r['doc_id']}|{r['start']}|{r['val']}".encode())
    return h.hexdigest()


def bench(fn, mapped, max_group_bytes):
    t0 = time.time()
    out, rounds = fn(mapped, max_group_bytes)
    out.write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 2), rounds


def main() -> None:
    one_x = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tile = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_mr100"
    spark = get_spark(app_name="measure_compact_jvm")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. exactness at sf0.01 (small enough to digest-compare), multiple
    #    byte budgets incl. one that exercises the min-2 overflow rule
    small = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", F.array_join(F.split("text", " "), "\n").alias("text")
    )
    mapped_small = map_phase(chunk_documents(small, 200)).localCheckpoint(eager=True)
    for budget in (120, 400, 4000):
        a, ra = compact_reduce(mapped_small, budget, max_rounds=3)
        b, rb = compact_reduce_jvm(mapped_small, budget, max_rounds=3)
        da, db = digest(a), digest(b)
        status = "EXACT" if (da == db and ra == rb) else "DIVERGED"
        print(f"budget={budget}: {status} rounds {ra}/{rb} {da[:12]}/{db[:12]}", flush=True)
        assert da == db and ra == rb, "JVM variant is not byte-exact"

    build(spark, one_x, tile)
    for name, sf_dir in (("1x", one_x), ("100x", tile)):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.array_join(F.split("text", " "), "\n").alias("text")
        )
        mapped = map_phase(chunk_documents(docs, 200)).localCheckpoint(eager=True)
        mapped.count()
        w_py, r_py = bench(compact_reduce, mapped, 400)
        w_jv, r_jv = bench(compact_reduce_jvm, mapped, 400)
        print(
            f"{name}: python {w_py}s/{r_py} rounds, jvm {w_jv}s/{r_jv} rounds, "
            f"win {round(w_py / max(w_jv, 0.01), 2)}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
