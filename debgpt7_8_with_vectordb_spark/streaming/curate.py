"""Incremental crawl curation sink: foreachBatch upsert into a
URL-keyed snapshot table (the production shape of ``stream_curate``'s
update-mode drain — NOTES round-9 candidate #5, built in round 8).

Per micro-batch: reduce the batch to its best row per canonical URL
(the first-fetch ``min_by``), merge with the current snapshot by the
SAME reduce (associative, so batch splits cannot change the result),
and publish a NEW versioned snapshot directory with an atomically
renamed pointer file — the ``incremental_index_build`` idempotency
discipline (streaming/sessionize.py): a replayed batch id observes the
pointer already at-or-past it and SKIPS, so checkpoint replays after a
crash never double-apply.

SNAPSHOT SCHEMA (external contract — anything reading the snapshot
directories or ``read_snapshot`` output sees these columns):
``(url_norm, url, fetched_at, html, domain, _mig)``. The underscore
column ``_mig boolean`` was added in round 9: it marks rows whose raw
``url`` was BACKFILLED by the pre-r9 snapshot migration (synthetic
lowercase spelling) rather than observed, and it must ride every
merge so a backfilled spelling keeps losing exact ``fetched_at`` ties
to genuine raw spellings — on every real (non-migrated) row it is
constant ``false``. Downstream consumers should treat ``_mig`` as
internal bookkeeping and may drop it; ``read_curated`` already does.

The snapshot holds the RAW keep state; the funnel tail (boilerplate,
length floor, content dedup) runs over it on read via
``read_curated`` — at 100 TB that tail is the periodic compaction
job, not a per-batch cost, and the per-batch work is one keyed reduce
over (batch + current-table) rows.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"


def _order_key():
    # (fetched_at, migrated-flag, RAW url) — byte-identical to the batch
    # keep-rule (operators/crawl.py) for real rows: the flag is a
    # constant False on every non-migrated row, so it never reorders
    # them. Rows whose url was BACKFILLED by the pre-r9 snapshot
    # migration carry True and therefore lose every exact fetched_at
    # tie to a genuine raw spelling (ADVICE r9: the synthetic lowercase
    # canonical form must never beat a real spelling batch curation
    # would have kept).
    return F.struct(
        F.coalesce(F.col("fetched_at"), F.lit("￿")).alias("_o1"),
        F.coalesce(F.col("_mig"), F.lit(False)).alias("_om"),
        F.col("url").alias("_o2"),
    )


def _reduce_best(pages: DataFrame) -> DataFrame:
    # _mig RIDES THE SNAPSHOT (selected into the keep struct and back
    # out): a backfilled synthetic spelling must keep losing exact
    # fetched_at ties to genuine raw spellings in EVERY later merge,
    # not just the first post-migration one — dropping the flag at
    # write time would launder the backfill into a "real" url
    pages = pages.withColumn(
        "_mig",
        F.coalesce(F.col("_mig"), F.lit(False))
        if "_mig" in pages.columns
        else F.lit(False),
    )
    keep = F.struct("url", "fetched_at", "html", "domain", "_mig")
    return (
        pages.groupBy("url_norm")
        .agg(F.min_by(keep, _order_key()).alias("_k"))
        .select(
            "url_norm",
            F.col("_k.url").alias("url"),
            F.col("_k.fetched_at").alias("fetched_at"),
            F.col("_k.html").alias("html"),
            F.col("_k.domain").alias("domain"),
            F.col("_k._mig").alias("_mig"),
        )
    )


def _latest_version(table_path: str) -> int | None:
    try:
        with open(os.path.join(table_path, _POINTER)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def _snapshot_dir(table_path: str, version: int) -> str:
    return os.path.join(table_path, f"v_{version:020d}")


def read_snapshot(spark: SparkSession, table_path: str) -> DataFrame | None:
    """The current URL-keyed keep state, or None before the first
    published snapshot."""
    v = _latest_version(table_path)
    if v is None:
        return None
    return spark.read.parquet(_snapshot_dir(table_path, v))


def curate_upsert_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, table_path: str
) -> bool:
    """One idempotent upsert; returns False when the batch id was
    already applied (checkpoint replay after a crash)."""
    latest = _latest_version(table_path)
    if latest is not None and latest >= batch_id:
        return False  # replay: snapshot already covers this batch
    best = _reduce_best(batch_df)
    current = read_snapshot(spark, table_path)
    if current is not None:
        if "url" not in current.columns:
            # migration: snapshots published before r9 carried no raw
            # url; backfill with the canonical form (the best available
            # spelling) so the keep-rule struct stays total, and flag
            # the rows so a backfilled spelling loses fetched_at ties
            # to any genuine raw spelling (ADVICE r9)
            current = current.withColumn(
                "url", F.col("url_norm")
            ).withColumn("_mig", F.lit(True))
        best = _reduce_best(
            current.unionByName(best, allowMissingColumns=True)
        )
    out = _snapshot_dir(table_path, batch_id)
    best.write.mode("overwrite").parquet(out)
    tmp = os.path.join(table_path, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, os.path.join(table_path, _POINTER))  # atomic publish
    return True


def curate_upsert_sink(
    pages: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    query_name: str = "curate_upsert",
):
    """Attach the upsert handler to a normalized-page stream
    ``(url_norm, url, fetched_at, html, domain)`` — the raw ``url``
    rides through the state struct as the keep-rule tiebreaker;
    caller triggers/awaits.
    Old snapshots are retained for time travel/debug — a production
    deployment prunes them past a retention horizon (the compaction
    sink's journaled-swap discipline applies if pruning must be crash-
    safe)."""
    os.makedirs(table_path, exist_ok=True)
    spark = pages.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        curate_upsert_batch(spark, batch_df, batch_id, table_path)

    return (
        pages.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )


def read_curated(
    spark: SparkSession, table_path: str, min_text_chars: int = 100
) -> DataFrame:
    """Curated documents from the current snapshot: md5 ids + the
    shared funnel tail (operators/crawl.finalize_curated)."""
    from ..operators.crawl import finalize_curated

    snap = read_snapshot(spark, table_path)
    if snap is None:
        raise FileNotFoundError(f"no snapshot published under {table_path}")
    best = snap.select(
        F.md5(F.col("url_norm")).alias("doc_id"),
        F.col("url_norm").alias("url"),
        "domain",
        "fetched_at",
        "html",
    )
    return finalize_curated(best, min_text_chars=min_text_chars)
