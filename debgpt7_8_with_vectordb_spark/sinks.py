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

#: per-partition compaction journal (underscore prefix — invisible to
#: readers). Present only between "rewrite landed in tmp" and "old
#: shards deleted"; its existence means the partition holds a superset
#: and names exactly which files are the duplicates.
COMPACT_MARKER = "_compact_inprogress.json"


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
    shards = _list_shards(path)
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


def _list_shards(path: str) -> list[str]:
    """Data shards under ``path`` FROM DISK, honoring Spark's
    hidden-file convention (path components starting with '.' or '_'
    are invisible to readers — so are crashed ``.compact-tmp`` dirs)."""
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        out.extend(
            os.path.relpath(os.path.join(root, f), path)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return sorted(out)


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

    The swap is MOVE-IN-THEN-DELETE under a PER-PARTITION JOURNAL
    (round 6, ADVICE r5): after the rewrite fully lands in a
    dot-prefixed tmp dir, an atomic ``COMPACT_MARKER`` is written into
    the live partition recording the old and new shard basenames; then
    the new files move in (Spark part-file names are UUID-based — no
    collision with the old set), the old files are deleted, and the
    marker is removed. A crash anywhere in the window leaves a SUPERSET
    of the data — never a partition whose only data files sit in a tmp
    dir readers ignore — and the NEXT pass (or ``recover_compaction``)
    rolls the journal FORWARD before any sizing decision: remaining new
    files move in, surviving old files (the named duplicates) are
    deleted, tmp and marker are cleared. Duplicates are therefore
    removed, not baked in by the re-read/rewrite (the r5-ADVICE hole:
    the manifest recount records an inflated count but compares against
    nothing). Shard inventory and sizing come from a DISK WALK, not the
    manifest: shards added out-of-band are compacted rather than
    silently deleted from the manifest's view, and shards removed
    out-of-band can't abort the pass with FileNotFoundError. Still
    single-writer; a concurrent-reader deployment does this inside a
    snapshotting table format instead (same compaction decision,
    different commit protocol).

    Returns the refreshed manifest plus a ``compacted`` list of the
    partition dirs rewritten and a ``recovered`` list of partition dirs
    whose interrupted journal was rolled forward."""
    import math
    import shutil

    man = read_manifest(path)  # partition_by only; shards come from disk
    recovered = recover_compaction(path)

    by_dir: dict[str, list[str]] = {}
    for rel in _list_shards(path):
        by_dir.setdefault(os.path.dirname(rel), []).append(
            os.path.join(path, rel)
        )

    compacted = []
    for d, files in sorted(by_dir.items()):
        old = sorted(files)  # snapshot BEFORE the rewrite lands
        total = sum(os.path.getsize(f) for f in old)
        want = max(1, math.ceil(total / target_bytes))
        if len(old) <= want:
            continue
        src = os.path.join(path, d) if d else path
        tmp = os.path.join(
            os.path.dirname(src), f".compact-tmp-{os.path.basename(src) or 'root'}"
        )
        shutil.rmtree(tmp, ignore_errors=True)
        spark.read.parquet(src).repartition(want).write.mode(
            "overwrite"
        ).parquet(tmp)
        new = sorted(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        # journal the swap BEFORE any file moves: from here on, a crash
        # is recoverable forward (every new file is in tmp or live;
        # every surviving old file is a named duplicate)
        marker = os.path.join(src, COMPACT_MARKER)
        mtmp = marker + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump(
                {"tmp": tmp, "old": [os.path.basename(f) for f in old],
                 "new": new},
                fh,
            )
        os.replace(mtmp, marker)
        for f in new:
            os.replace(os.path.join(tmp, f), os.path.join(src, f))
        for f in old:
            os.remove(f)
        shutil.rmtree(tmp)
        os.remove(marker)
        compacted.append(d)

    manifest = _write_manifest(spark, path, man["partition_by"])
    manifest["compacted"] = compacted
    manifest["recovered"] = recovered
    return manifest


def recover_compaction(path: str) -> list[str]:
    """Roll FORWARD every interrupted compaction journal under ``path``.

    A ``COMPACT_MARKER`` exists only after the rewrite fully landed in
    its tmp dir, so forward completion is always valid: move any listed
    new shard still in tmp into the live partition (``os.replace`` is
    atomic — a file is in exactly one place), delete any listed old
    shard still present (these are the duplicate rows a crashed swap
    left), then clear tmp and the marker. Idempotent: re-running after
    a crash MID-RECOVERY just resumes. Returns the partition dirs
    (relative to ``path``) that needed recovery."""
    import shutil

    recovered = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        if COMPACT_MARKER not in files:
            continue
        marker = os.path.join(root, COMPACT_MARKER)
        with open(marker) as fh:
            st = json.load(fh)
        # Safety gate BEFORE any delete: every journaled new shard must be
        # reachable in tmp or already live. If tmp vanished (tmp-dir
        # cleanup, corpus relocated — the journal stores an absolute path)
        # before any new shard moved in, deleting st['old'] would destroy
        # the only copies. Leave the marker and skip; the caller re-runs
        # compaction from the still-intact old shards.
        missing = [
            name
            for name in st["new"]
            if not os.path.exists(os.path.join(st["tmp"], name))
            and not os.path.exists(os.path.join(root, name))
        ]
        if missing:
            continue
        for name in st["new"]:
            t = os.path.join(st["tmp"], name)
            if os.path.exists(t):
                os.replace(t, os.path.join(root, name))
        for name in st["old"]:
            p = os.path.join(root, name)
            if os.path.exists(p):
                os.remove(p)
        shutil.rmtree(st["tmp"], ignore_errors=True)
        os.remove(marker)
        recovered.append(os.path.relpath(root, path))
    return sorted(recovered)


def rewrite_corpus_inplace(
    spark, path: str, transform, diff_report: bool = True
) -> dict:
    """S23's second half — the in-place sink (reference cli.py:340-373
    rewrites one file with the transformed content and prints a diff).
    At corpus scale the same verb is: apply a row-wise ``transform(df)
    -> df`` to every partition of a parquet corpus and atomically
    replace its shards, crash-safe, with a changed-row report standing
    in for the diff.

    Mechanics reuse the compaction journal verbatim: per partition
    directory, the transformed rewrite fully lands in a dot-prefixed
    tmp dir, a ``COMPACT_MARKER`` journals {tmp, old, new}, new shards
    move in, old shards are deleted, marker cleared. A crash anywhere
    is rolled FORWARD by ``recover_compaction`` (the journal only
    exists once the new data is complete on disk), so the established
    recovery drill — including the vanished-tmp abort — covers this
    sink with zero new protocol. Reading each partition DIRECTORY means
    partition-key columns aren't in the frame, so a row-wise transform
    cannot corrupt the dir-encoded routing — the constraint is
    structural, not a convention.

    ``diff_report=True`` counts changed rows per partition
    (written-new ``exceptAll`` old, certified from the files on disk
    BEFORE the swap) — the reference's unified-diff side effect
    re-expressed as the aggregate a 100 TB run can afford. Returns the
    refreshed manifest + ``rewritten`` dirs + ``n_changed`` total."""
    import shutil

    man = read_manifest(path)
    recovered = recover_compaction(path)

    by_dir: dict[str, list[str]] = {}
    for rel in _list_shards(path):
        by_dir.setdefault(os.path.dirname(rel), []).append(
            os.path.join(path, rel)
        )

    rewritten = []
    n_changed = 0
    for d, files in sorted(by_dir.items()):
        old = sorted(files)
        src = os.path.join(path, d) if d else path
        tmp = os.path.join(
            os.path.dirname(src),
            f".rewrite-tmp-{os.path.basename(src) or 'root'}",
        )
        shutil.rmtree(tmp, ignore_errors=True)
        df_old = spark.read.parquet(src)
        df_new = transform(df_old)
        if [f.name for f in df_new.schema.fields] != [
            f.name for f in df_old.schema.fields
        ]:
            raise ValueError(
                "in-place rewrite must preserve the column set; got "
                f"{df_new.columns} vs {df_old.columns}"
            )
        df_new.write.mode("overwrite").parquet(tmp)
        if diff_report:
            n_changed += (
                spark.read.parquet(tmp).exceptAll(df_old).count()
            )
        new = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        marker = os.path.join(src, COMPACT_MARKER)
        mtmp = marker + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump(
                {"tmp": tmp, "old": [os.path.basename(f) for f in old],
                 "new": new},
                fh,
            )
        os.replace(mtmp, marker)
        for f in new:
            os.replace(os.path.join(tmp, f), os.path.join(src, f))
        for f in old:
            os.remove(f)
        shutil.rmtree(tmp)
        os.remove(marker)
        rewritten.append(d)

    manifest = _write_manifest(spark, path, man["partition_by"])
    manifest["rewritten"] = rewritten
    manifest["recovered"] = recovered
    manifest["n_changed"] = n_changed
    return manifest


def rewrite_file_inplace(path: str, new_content: str) -> str:
    """The reference's literal S23/F16 behavior for a single text file
    (cli.py:340-362): replace the file's content and return the unified
    diff of the change. Differences from the reference, deliberate:
    the write is ATOMIC (tmp + os.replace — a crash never leaves a
    half-written file) and the diff is returned, not printed. Keeps
    the reference's trailing-newline normalization (content not ending
    in a newline gets one on disk; the diff compares logical lines)."""
    import difflib

    with open(path, "rt") as fp:
        original = fp.read()
    diff = "".join(
        difflib.unified_diff(
            original.splitlines(keepends=True),
            new_content.splitlines(keepends=True),
            "Original",
            "Edited",
        )
    )
    tmp = path + ".inplace-tmp"
    with open(tmp, "wt") as fp:
        fp.write(
            new_content if new_content.endswith("\n") else new_content + "\n"
        )
    os.replace(tmp, path)
    return diff
