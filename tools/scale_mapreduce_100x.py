"""100x scale check for the mapreduce reduce loops + binpack family
(VERDICT r8 #4 — the one family whose largest tile was 10x).

Tiles sf0.1's documents 100x -> 500k docs (copy token appended, same
honest-growth recipe as scale_docs_100x). The two scale risks named by
the r8 verdict are measured directly:

- DRIVER-ROUND COUNT: tree_reduce runs one Spark job per round; rounds
  must grow O(log n) (plus the 4096-row end-game collapse), never
  linearly. compact_reduce's n-ary fan-in shrinks faster still.
- CHECKPOINT BLOCK ACCUMULATION: every round localCheckpoints to
  truncate lineage; blocks from superseded rounds must not pile up
  unboundedly in the block manager. We report the block-manager
  mem+disk footprint of ALL live checkpoint RDDs after each reduce
  (getRDDStorageInfo) — acceptance is "bounded by a small multiple of
  the live round's data", not zero (Spark frees superseded blocks on
  GC, so a snapshot may hold the final round plus stragglers).

Also times the binpack operators over the same tile: chunk_and_pack
(the fused zero-shuffle 100 TB path) and pack_chunks_crossdoc (the
two-pass ranged pack).

Usage: python tools/scale_mapreduce_100x.py [one_x_dir] [out_dir]
Prints a growth table for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from debgpt7_8_with_vectordb_spark.operators.binpack import (  # noqa: E402
    chunk_and_pack,
    pack_chunks_crossdoc,
)
from debgpt7_8_with_vectordb_spark.operators.chunker import (  # noqa: E402
    chunk_documents,
)
from debgpt7_8_with_vectordb_spark.operators.mapreduce import (  # noqa: E402
    compact_reduce,
    map_phase,
    tree_reduce,
)
from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402
from debgpt7_8_with_vectordb_spark.tables import load_table  # noqa: E402

COPIES = 100


def build(spark, src: str, out: str) -> None:
    if os.path.exists(f"{out}/documents.parquet"):
        return
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{src}/documents.parquet")
    n = docs.count()
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    cols = [c for c in docs.columns if c not in ("doc_id", "text")]
    tiled = docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" copytok"), F.col("copy").cast("string")
        ).alias("text"),
        *cols,
    )
    tiled.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )


def _ckpt_footprint(spark) -> tuple[float, float]:
    """(mem MB, disk MB) currently held by persisted RDD blocks."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    return round(mem / 1e6, 1), round(disk / 1e6, 1)


def run(spark, sf_dir: str) -> dict[str, float]:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_join(F.split("text", " "), "\n").alias("text")
    )
    out: dict[str, float] = {}

    t0 = time.time()
    chunks = chunk_documents(docs, 200)
    mapped = map_phase(chunks).localCheckpoint(eager=True)
    out["chunks"] = float(mapped.count())
    out["chunk_map_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    final, rounds = tree_reduce(mapped)
    final.write.mode("overwrite").format("noop").save()
    out["tree_reduce_sec"] = round(time.time() - t0, 2)
    out["tree_rounds"] = float(rounds)
    mem, disk = _ckpt_footprint(spark)
    out["ckpt_after_tree_mem_mb"], out["ckpt_after_tree_disk_mb"] = mem, disk

    t0 = time.time()
    final, rounds = compact_reduce(mapped, 400)
    final.write.mode("overwrite").format("noop").save()
    out["compact_reduce_sec"] = round(time.time() - t0, 2)
    out["compact_rounds"] = float(rounds)
    mem, disk = _ckpt_footprint(spark)
    out["ckpt_after_compact_mem_mb"] = mem
    out["ckpt_after_compact_disk_mb"] = disk

    # binpack family over the same tile
    t0 = time.time()
    chunk_and_pack(docs, 200, 800).write.mode("overwrite").format(
        "noop"
    ).save()
    out["chunk_and_pack_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    pack_chunks_crossdoc(
        chunks.select("doc_id", "start", F.col("n_bytes")), 800, 1000
    ).write.mode("overwrite").format("noop").save()
    out["pack_crossdoc_sec"] = round(time.time() - t0, 2)
    return out


def main() -> None:
    one_x = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_mr100"
    # event log on: the blocked tree_reduce packs 4096-row blocks per
    # task, so ONE slow block would serialize a whole pass — audit
    # max/median task time per stage like the other tiles (VERDICT r9 #5)
    from tools.scale_events_100x import EVENT_DIR, task_skew

    os.makedirs(EVENT_DIR, exist_ok=True)
    spark = get_spark(
        app_name="scale_mapreduce_100x",
        extra_confs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENT_DIR,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    build(spark, one_x, out_dir)
    # warm the python worker pool + codegen
    spark.read.parquet(f"{one_x}/region.parquet").groupBy(
        "r_name"
    ).count().count()
    r1 = run(spark, one_x)
    print("1x  ", r1, flush=True)
    t_from = time.time()
    r100 = run(spark, out_dir)
    t_to = time.time()
    print("100x", r100, flush=True)
    for k in ("tree_reduce_sec", "compact_reduce_sec", "chunk_and_pack_sec"):
        if r1.get(k):
            print(f"growth {k}: {round(r100[k] / r1[k], 1)}x wall for 100x rows")
    spark.stop()
    print("\nstage skew (100x run; straggler = max > 4x median):", flush=True)
    skew = task_skew(app_id, t_from, t_to)
    worst = max((mx / med for _, med, mx, _ in skew), default=0.0)
    print(f"worst max/median {worst:.1f}x over {len(skew)} audited stages")
    for n, med, mx, sname in skew:
        flag = "  <-- STRAGGLER" if mx > 4 * med else ""
        print(f"  tasks={n:>3} median={med:.0f}ms max={mx:.0f}ms{flag}  {sname[:70]}")


if __name__ == "__main__":
    main()
