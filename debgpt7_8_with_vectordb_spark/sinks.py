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

    written = df.sparkSession.read.parquet(path)
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
