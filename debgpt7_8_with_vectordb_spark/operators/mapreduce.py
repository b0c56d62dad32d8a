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
- each reduce round pairs rows by ``row_number()//2`` within a group and
  combines pairs with ``applyInPandas``; the driver loops while
  ``count > 1`` (same shape as ``RDD.treeReduce``);
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

    Pairing key = row_number()//2 over the stable (doc_id, start, val)
    order; the odd tail element rides along unmerged (reference
    mapreduce.py:337-350). Each round shuffles only ⌈n/2⌉ groups.
    """
    df = mapped.select(
        F.col("doc_id"), F.col("start"), F.col("val")
    )
    n = df.count()
    rounds = 0
    limit = max_rounds if max_rounds is not None else max(1, int(math.log2(max(n, 2))) + 2)
    w = Window.orderBy("doc_id", "start")
    while n > 1 and rounds < limit:
        paired = df.withColumn("rn", F.row_number().over(w) - 1).withColumn(
            "pair", (F.col("rn") / 2).cast("long")
        )

        def combine_pair(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("rn")
            return pd.DataFrame(
                {
                    "doc_id": [pdf["doc_id"].iloc[0]],
                    "start": [pdf["start"].iloc[0]],
                    "val": [combine.join(pdf["val"])],
                }
            )

        df = (
            paired.groupBy("pair")
            .applyInPandas(combine_pair, schema="doc_id long, start int, val string")
            .localCheckpoint(eager=True)
        )
        n = df.count()
        rounds += 1
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

    Scale shape: packing is order-dependent over the SIZE vector only,
    so the driver packs sizes (one int per row — KBs even at 100 TB
    chunk counts, and rounds shrink geometrically) and broadcast-joins
    the group ids back; payloads never leave the executors.
    """
    from .binpack import pack_sizes

    df = mapped.select("doc_id", "start", "val")
    n = df.count()
    rounds = 0
    limit = max_rounds if max_rounds is not None else max(1, int(math.log2(max(n, 2))) + 2)
    w = Window.orderBy("doc_id", "start")
    while n > 1 and rounds < limit:
        keyed = df.withColumn("rn", F.row_number().over(w) - 1)
        sizes = [
            r["nb"]
            for r in keyed.select("rn", F.octet_length("val").alias("nb"))
            .orderBy("rn")
            .collect()
        ]
        gids = pack_sizes(sizes, max_group_bytes, min_per_group=2)
        gid_map = keyed.sparkSession.createDataFrame(
            list(enumerate(gids)), "rn long, pack long"
        )
        packed = keyed.join(F.broadcast(gid_map), "rn")

        def combine_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("rn")
            return pd.DataFrame(
                {
                    "doc_id": [pdf["doc_id"].iloc[0]],
                    "start": [pdf["start"].iloc[0]],
                    "val": [combine.join(pdf["val"])],
                }
            )

        df = (
            packed.groupBy("pack")
            .applyInPandas(combine_group, schema="doc_id long, start int, val string")
            .localCheckpoint(eager=True)
        )
        n = df.count()
        rounds += 1
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
