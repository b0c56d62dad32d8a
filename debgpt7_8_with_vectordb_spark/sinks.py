"""Corpus sinks — the write side of a curation pipeline.

The reference's sinks are presentation-scale (S6 JSONL dump,
vectordb.py:258-279; `--out`, main.py — see cli.py). A 100 TB curation
run ends differently: the curated corpus is written back as partitioned,
size-bounded parquet shards that the NEXT pipeline stage (tokenizer,
packer, trainer data-loader) can list, prune, and stream. This module is
that sink, with the layout decisions a scale run needs made explicit:

- ``partitionBy`` low-cardinality routing keys (lang/source) so
  downstream filters prune directories, never rows;
- ``maxRecordsPerFile`` bounds shard size regardless of upstream
  partitioning — a skewed partition spills into more files, not one
  giant shard;
- optional within-shard ordering (``sort_within``) so each file is
  locally sorted (better parquet min/max pruning on the sort key);
- an atomic manifest written AFTER the data commit, recording the
  shard inventory + per-partition row counts — the handshake a
  downstream stage polls instead of listing the directory racily.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MANIFEST = "_corpus_manifest.json"


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("lang",),
    max_records_per_file: int = 0,
    sort_within: Sequence[str] = (),
) -> dict:
    """Write ``df`` as a partitioned parquet corpus + manifest.

    Returns the manifest dict (also persisted at ``path/MANIFEST``).
    The manifest counts come from the WRITTEN files (read back), not the
    input plan — it certifies what landed on disk.
    """
    out = df
    if sort_within:
        # The dynamic-partition writer requires rows sorted by the
        # partition columns within each task and inserts its own
        # (order-destroying) sort if they aren't. Sorting by
        # (partition_by, sort_within) satisfies that requirement, so the
        # writer skips its sort and the within-shard order survives.
        out = out.sortWithinPartitions(*partition_by, *sort_within)
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return _write_manifest(df.sparkSession, path, partition_by)


def _write_manifest(spark, path: str, partition_by: Sequence[str]) -> dict:
    """Recount the corpus FROM DISK and atomically (re)write the
    manifest — it certifies what landed, not what the plan promised."""
    written = spark.read.parquet(path)
    if partition_by:
        counts = {
            "|".join(str(r[k]) for k in partition_by): r["cnt"]
            for r in written.groupBy(*partition_by)
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
    else:
        counts = {"": written.count()}
    shards = sorted(
        os.path.relpath(os.path.join(root, f), path)
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    manifest = {
        "path": path,
        "partition_by": list(partition_by),
        "n_rows": sum(counts.values()),
        "rows_per_partition": counts,
        "n_shards": len(shards),
        "shards": shards,
    }
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)


def compact_corpus(spark, path: str, target_bytes: int = 128 << 20) -> dict:
    """Small-shard compaction — the maintenance pass every long-lived
    100 TB corpus needs: dynamic-partition writes and incremental
    appends leave partitions holding many files far below the parquet
    sweet spot (~128-256 MB), and scan parallelism/open-file overhead
    degrade with file COUNT, not byte count. Per partition directory:
    if it holds more files than ceil(total_bytes / target_bytes), read
    just that partition, rewrite it into that many shards, and swap the
    files in; right-sized partitions are left untouched (incremental —
    cost tracks the debt, not the corpus). The manifest is recounted
    from disk afterwards.

    The swap is remove-then-move on the local filesystem — fine for the
    single-writer contract this sink documents; a concurrent-reader
    deployment does this inside a snapshotting table format instead
    (same compaction decision, different commit protocol).

    Returns the refreshed manifest plus a ``compacted`` list of the
    partition dirs rewritten."""
    import math
    import shutil

    man = read_manifest(path)
    by_dir: dict[str, list[str]] = {}
    for rel in man["shards"]:
        by_dir.setdefault(os.path.dirname(rel), []).append(
            os.path.join(path, rel)
        )

    compacted = []
    for d, files in sorted(by_dir.items()):
        total = sum(os.path.getsize(f) for f in files)
        want = max(1, math.ceil(total / target_bytes))
        if len(files) <= want:
            continue
        src = os.path.join(path, d) if d else path
        tmp = os.path.join(
            os.path.dirname(src), f".compact-tmp-{os.path.basename(src) or 'root'}"
        )
        shutil.rmtree(tmp, ignore_errors=True)
        spark.read.parquet(src).repartition(want).write.mode(
            "overwrite"
        ).parquet(tmp)
        for f in files:
            os.remove(f)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                os.replace(os.path.join(tmp, f), os.path.join(src, f))
        shutil.rmtree(tmp)
        compacted.append(d)

    manifest = _write_manifest(spark, path, man["partition_by"])
    manifest["compacted"] = compacted
    return manifest
