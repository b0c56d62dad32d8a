"""Map → tree-reduce dataflow over chunks (reference M1-M5, A4/A5).

Reference (mapreduce.py:434-550): chunk the input, apply an LLM
"extract" prompt per chunk (ThreadPool, default 8 threads), then
pairwise LLM-combine the results in ⌈log₂ n⌉ rounds until one remains;
odd element carried over; single-chunk input short-circuits with zero
calls (mapreduce.py:489-490).

Spark shape:
- the map phase is a column expression (deterministic extractors) or an
  Arrow-batched ``mapInPandas`` (real model calls) — task parallelism
  replaces the ThreadPool;
- each reduce round pairs rows by an exact global index (per-partition
  rank + broadcast partition offsets — never a single-partition window)
  and combines pairs with ``applyInPandas``; the driver loops while
  ``count > 1`` (same shape as ``RDD.treeReduce``) and only ever sees
  the count;
- ``localCheckpoint`` each round truncates the growing lineage
  (SURVEY.md §4.3.2).

The deterministic test "LLM" is echo-lossy: keep every ``rate``-th
character (the reference ships exactly this fake for its own tests —
frontend.py:289-293 EchoFrontend.lossy_mode).
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: Rows per range partition when assigning the global pairing index.
#: 64 Ki rows/partition keeps the per-partition window cheap and bounds
#: the broadcast offset table at ~n/65536 rows (10¹¹ chunks → ~1.5 M
#: offset rows ≈ 25 MB — broadcastable; the data itself never funnels).
_RN_PARTITION_ROWS = 65536

#: Rows per contiguous packing block in compact_reduce. Packing is
#: greedy-sequential WITHIN a block (executor-side), blocks are exact
#: rn//4096 slices, so results are deterministic under any physical
#: partitioning. Inputs ≤ 4096 rows are one block = the reference's
#: exact global greedy scan (mapreduce.py:287-326).
_PACK_BLOCK_ROWS = 4096


def _with_global_rn(df: DataFrame, order_cols: list[str], n: int) -> DataFrame:
    """Exact 0-based global row number in ``order_cols`` order WITHOUT a
    single-partition window (the round-1 scale-killer): range-partition
    on the order key, rank within each partition, then add per-partition
    offsets (a broadcast table of ≤ ⌈n/65536⌉ rows — the only data that
    leaves the executors is one (partition, count) pair per partition).

    Every stage is parallel; the offset cumulative sum runs over the
    tiny counts table only. Ordering keys are unique per row (chunk
    (doc_id, start)), so the result is deterministic regardless of where
    the range sampler places partition boundaries.
    """
    nparts = max(1, math.ceil(n / _RN_PARTITION_ROWS))
    cols = [F.col(c) for c in order_cols]
    if nparts == 1:
        # shrunken tail (≤ 64 Ki rows): no counts/offsets jobs needed —
        # the constant-key window shuffles ONLY the bounded tail into one
        # task (upstream stages keep their parallelism). This is the only
        # place a single-partition window appears, and it is bounded by
        # _RN_PARTITION_ROWS rows by construction.
        w = Window.partitionBy(F.lit(0)).orderBy(*cols)
        return df.withColumn(
            "rn", (F.row_number().over(w) - F.lit(1)).cast("long")
        )
    keyed = (
        df.repartitionByRange(nparts, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)),
        )
    )
    counts = keyed.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # cumulative offsets over the COUNTS table (≤ nparts rows): the one
    # place a global window is fine — it sees one row per partition, not
    # one row per chunk.
    ow = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(ow), F.lit(0)).alias("_off")
    )
    return (
        keyed.join(F.broadcast(offsets), "_pid")
        .withColumn("rn", (F.col("_off") + F.col("_lrn") - F.lit(1)).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def _checkpoint_rdd_id(df: DataFrame) -> "int | None":
    """The JVM RDD id that ``localCheckpoint(eager=True)`` persisted:
    a checkpointed DataFrame's analyzed plan is a LogicalRDD wrapping
    exactly that RDD. Extracting it from the DataFrame object makes
    superseded-checkpoint freeing EXACT — no session-global
    before/after id diffs that could misattribute (and free mid-use) a
    concurrent job's blocks on a shared SparkSession (ADVICE r9)."""
    try:
        return int(df._jdf.queryExecution().analyzed().rdd().id())
    except Exception:  # not a LogicalRDD plan: nothing was persisted
        return None


def _unpersist_rdds(spark, ids: set[int]) -> None:
    """Deterministically free SUPERSEDED reduce-round checkpoints. The
    ContextCleaner would GC them eventually, but 'eventually' at the
    100x tile meant carrying every round's blocks (~1 GB held for a
    150 MB corpus, measured in tools/scale_mapreduce_100x.py) until JVM
    GC — at 100 TB that is pure memory-pressure. Safe because round r+1
    reads ONLY round r's checkpoint: blocks from r-1 can never be
    recomputed (truncated lineage) but are never needed again either.
    ``ids`` are exact per-DataFrame checkpoint ids from
    :func:`_checkpoint_rdd_id` — concurrent jobs on the same session
    can never be misattributed."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        if int(k) in ids:
            jmap.get(k).unpersist(False)


def echo_lossy(col: Column, rate: int = 2) -> Column:
    """Deterministic 'extraction': every rate-th char, as a Catalyst
    expression (filter over the char positions — no UDF)."""
    chars = F.split(col, "")
    n = F.size(chars)
    picked = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.when(((i - 1) % rate) == 0, F.element_at(chars, i)).otherwise(F.lit("")),
    )
    return F.when(n <= 0, F.lit("")).otherwise(F.array_join(picked, ""))


def map_phase(chunks: DataFrame, content_col: str = "content", rate: int = 2) -> DataFrame:
    """M1 deterministic map: one 'extracted' string per chunk, keyed for
    a stable global order (doc_id, start)."""
    return chunks.select(
        F.col("doc_id"),
        F.col("start"),
        echo_lossy(F.col(content_col), rate).alias("val"),
    )


def tree_reduce(
    mapped: DataFrame,
    combine: str = "\n",
    max_rounds: int | None = None,
) -> tuple[DataFrame, int]:
    """A4 binary tree reduction: pair adjacent rows, concatenate, repeat
    until one row remains. Returns (1-row DataFrame, rounds run).

    Pairing key = rn//2 over the stable global (doc_id, start) order; the
    odd tail element rides along unmerged (reference mapreduce.py:337-350).
    The global index comes from ``_with_global_rn`` (per-partition rank +
    broadcast offsets), so every pass is fully parallel — never a
    single-partition funnel.

    BLOCKED MULTI-ROUND execution (the r9 100x-tile fix): one Spark job
    per ROUND paid ~n/2 two-row applyInPandas groups of Arrow/pandas
    overhead — measured 147x wall for 100x rows. Instead, each pass
    slices the surviving rows into exact contiguous aligned blocks of
    ``_PACK_BLOCK_ROWS`` (= 2^12) and replays up to 12 adjacent-pairing
    rounds INSIDE each task over plain Python lists. This is exactly the
    global algorithm: a full 2^12 block's survivor count is even at
    every level (2^12/2^r for r < 12), so pairing never crosses a block
    boundary within a pass, and only the final partial block ever holds
    the odd tail — the same tail the global rounds produce. Rounds
    still total ceil(log2(n)) (12 + ceil(log2(ceil(n/4096))) ==
    ceil(log2(n))), which the mapreduce_echo oracle pins, and the final
    string is byte-identical (tests pin the digests). A 10^11-chunk
    corpus now costs ~3 shuffle passes, not ~37 per-round jobs.

    Round-15 action fold (guide §1.2 step 1): the map output is
    materialized ONCE with its row count riding that same action as an
    Observation metric — previously the loop-control ``count()``
    executed the whole map phase (chunker + per-char echo transform)
    and pass 1 then recomputed it — and each pass's max(_rounds)/count
    pair rides the pass's own checkpoint action the same way, dropping
    two follow-up jobs per pass. The mapped checkpoint is freed by the
    loop's existing deterministic unpersist as soon as pass 1's output
    is materialized.
    """
    from pyspark.sql import Observation

    obs0 = Observation()
    df = (
        mapped.select(F.col("doc_id"), F.col("start"), F.col("val"))
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n = int(obs0.get["n"])
    rounds = 0
    limit = max_rounds if max_rounds is not None else max(1, int(math.log2(max(n, 2))) + 2)
    # block must hold >= 2 rows to guarantee progress; a 2-row block is
    # exactly one distributed pairing round (the pre-r9 per-round shape)
    block_rows = max(2, _PACK_BLOCK_ROWS)
    block_levels = max(1, int(math.log2(block_rows)))
    spark = mapped.sparkSession
    prev_ids: set[int] = {_checkpoint_rdd_id(df)} - {None}
    while n > 1 and rounds < limit:
        cap = min(limit - rounds, block_levels)

        def reduce_block(pdf: pd.DataFrame) -> pd.DataFrame:
            # (doc_id, start) order == rn order within a block
            pdf = pdf.sort_values(["doc_id", "start"]).reset_index(drop=True)
            rows = list(zip(pdf["doc_id"], pdf["start"], pdf["val"]))
            r = 0
            while len(rows) > 1 and r < cap:
                rows = [
                    (
                        rows[i][0],
                        rows[i][1],
                        combine.join(v for _, _, v in rows[i : i + 2]),
                    )
                    for i in range(0, len(rows), 2)
                ]
                r += 1
            return pd.DataFrame(
                [(int(d), int(s), v, r) for d, s, v in rows],
                columns=["doc_id", "start", "val", "_rounds"],
            )

        if n <= block_rows:
            # end-game: the tail fits one task — no index pass needed
            blocked = df.withColumn("_blk", F.lit(0))
        else:
            blocked = (
                _with_global_rn(df, ["doc_id", "start"], n)
                .withColumn(
                    "_blk", (F.col("rn") / block_rows).cast("long")
                )
                .drop("rn")
            )
        obs = Observation()
        done = (
            blocked.groupBy("_blk")
            .applyInPandas(
                reduce_block,
                schema="doc_id long, start int, val string, _rounds int",
            )
            .observe(
                obs,
                F.max("_rounds").alias("r"),
                F.count(F.lit(1)).alias("n"),
            )
            .localCheckpoint(eager=True)
        )
        rounds += int(obs.get["r"])
        n = int(obs.get["n"])
        df = done.select("doc_id", "start", "val")
        _unpersist_rdds(spark, prev_ids)
        prev_ids = {_checkpoint_rdd_id(done)} - {None}
    return df, rounds


def compact_reduce(
    mapped: DataFrame,
    max_group_bytes: int,
    combine: str = "\n",
    max_rounds: int | None = None,
) -> tuple[DataFrame, int]:
    """A5/C4 compact (n-ary) reduction: greedily bin-pack rows into
    ≤max_group_bytes groups — at least 2 per group so every round
    strictly shrinks (reference mapreduce.py:287-326) — combine each
    group, repeat until one row remains.

    Scale shape: the greedy scan is order-dependent, so it runs
    EXECUTOR-SIDE over exact contiguous rn//4096 blocks — each task
    packs and combines its own block in one ``applyInPandas`` pass;
    nothing but the loop-control count ever reaches the driver. Blocks
    are order-preserving slices, so the final concatenation is identical
    to a global scan (the '\\n'-join is associative); inputs ≤ 4096 rows
    are a single block and reproduce the reference's global greedy
    byte-for-byte. A 1-row trailing block simply rides to the next round
    (same as the odd-tail rule), and block 0 always holds ≥2 rows when
    n ≥ 2, so every round shrinks.
    """
    from pyspark.sql import Observation

    from .binpack import pack_sizes

    # round-15 action fold — same as tree_reduce: map output materialized
    # once with its count as an Observation metric; per-pass max/count
    # ride each pass's checkpoint action
    obs0 = Observation()
    df = (
        mapped.select("doc_id", "start", "val")
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n = int(obs0.get["n"])
    rounds = 0
    limit = max_rounds if max_rounds is not None else max(1, int(math.log2(max(n, 2))) + 2)
    spark = mapped.sparkSession
    prev_ids: set[int] = {_checkpoint_rdd_id(df)} - {None}
    while n > 1 and rounds < limit:
        if n <= _PACK_BLOCK_ROWS:
            # END-GAME: the tail is a single packing block anyway, so
            # run ALL remaining pack→combine rounds in one task (see
            # tree_reduce) instead of one Spark job per round. Identical
            # per-round semantics: global greedy pack over the
            # (doc_id, start) order, min-2 groups, repeat.
            remaining = limit - rounds

            def finish_pack(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values(["doc_id", "start"]).reset_index(drop=True)
                rows = list(zip(pdf["doc_id"], pdf["start"], pdf["val"]))
                r = 0
                while len(rows) > 1 and r < remaining:
                    sizes = [len((v or "").encode("utf-8")) for _, _, v in rows]
                    gids = pack_sizes(sizes, max_group_bytes, min_per_group=2)
                    nxt: list[tuple[int, int, str]] = []
                    lo = 0
                    for hi in range(1, len(gids) + 1):
                        if hi == len(gids) or gids[hi] != gids[lo]:
                            nxt.append(
                                (
                                    rows[lo][0],
                                    rows[lo][1],
                                    combine.join(v for _, _, v in rows[lo:hi]),
                                )
                            )
                            lo = hi
                    rows = nxt
                    r += 1
                return pd.DataFrame(
                    [(int(d), int(s), v, r) for d, s, v in rows],
                    columns=["doc_id", "start", "val", "_rounds"],
                )

            obs = Observation()
            done = (
                df.withColumn("_g", F.lit(0))
                .groupBy("_g")
                .applyInPandas(
                    finish_pack,
                    schema="doc_id long, start int, val string, _rounds int",
                )
                .observe(
                    obs,
                    F.max("_rounds").alias("r"),
                    F.count(F.lit(1)).alias("n"),
                )
                .localCheckpoint(eager=True)
            )
            rounds += int(obs.get["r"])
            n = int(obs.get["n"])
            df = done.select("doc_id", "start", "val")
            _unpersist_rdds(spark, prev_ids)
            prev_ids = {_checkpoint_rdd_id(done)} - {None}
            continue
        keyed = _with_global_rn(df, ["doc_id", "start"], n).withColumn(
            "block", (F.col("rn") / _PACK_BLOCK_ROWS).cast("long")
        )

        def pack_and_combine(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("rn").reset_index(drop=True)
            sizes = [len((v or "").encode("utf-8")) for v in pdf["val"]]
            gids = pack_sizes(sizes, max_group_bytes, min_per_group=2)
            out: list[tuple[int, int, str]] = []
            lo = 0
            for hi in range(1, len(gids) + 1):
                if hi == len(gids) or gids[hi] != gids[lo]:
                    out.append(
                        (
                            int(pdf["doc_id"].iloc[lo]),
                            int(pdf["start"].iloc[lo]),
                            combine.join(pdf["val"].iloc[lo:hi]),
                        )
                    )
                    lo = hi
            return pd.DataFrame(out, columns=["doc_id", "start", "val"])

        obs = Observation()
        df = (
            keyed.groupBy("block")
            .applyInPandas(pack_and_combine, schema="doc_id long, start int, val string")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n = int(obs.get["n"])
        rounds += 1
        _unpersist_rdds(spark, prev_ids)
        prev_ids = {_checkpoint_rdd_id(df)} - {None}
    return df, rounds


def mapreduce_echo(chunks: DataFrame, rate: int = 2) -> DataFrame:
    """Full M4 pipeline with the deterministic echo extractor; returns one
    row (final_len, digest, rounds). Single-chunk inputs short-circuit
    inside tree_reduce (n==1 → zero rounds), like mapreduce.py:489-490."""
    mapped = map_phase(chunks, rate=rate)
    final, rounds = tree_reduce(mapped)
    return final.select(
        F.length("val").cast("long").alias("final_len"),
        F.md5(F.col("val").cast("binary")).alias("digest"),
        F.lit(rounds).cast("long").alias("rounds"),
    )


def mapreduce_echo_compact(
    chunks: DataFrame, max_group_bytes: int, rate: int = 2
) -> DataFrame:
    """M4 pipeline in COMPACT mode (reference mode matrix
    mapreduce.py:494-547: {serial,parallel}×{binary,compact} — Spark is
    always parallel, compact-vs-binary stays a parameter): echo map →
    n-ary bin-packed reduce. Converges in ⌈log_f n⌉ rounds where f =
    average group fan-in (≥2 guaranteed by C4's min-2 rule)."""
    mapped = map_phase(chunks, rate=rate)
    final, rounds = compact_reduce(mapped, max_group_bytes)
    return final.select(
        F.length("val").cast("long").alias("final_len"),
        F.md5(F.col("val").cast("binary")).alias("digest"),
        F.lit(rounds).cast("long").alias("rounds"),
    )
