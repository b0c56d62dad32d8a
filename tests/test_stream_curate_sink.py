"""foreachBatch upsert sink for incremental crawl curation
(streaming/curate.py): cross-batch upsert semantics, crash-replay
idempotency, restart-from-checkpoint across separate drains, ingestion-
order invariance, and equality with the batch funnel."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from debgpt7_8_with_vectordb_spark.functions.web import (
    normalize_url_column,
    robots_filter,
)
from debgpt7_8_with_vectordb_spark.plans import QUERIES
from debgpt7_8_with_vectordb_spark.plans.curation_queries import (
    _curated_output,
    _robots_table,
    _synth_warc,
)
from debgpt7_8_with_vectordb_spark.streaming.curate import (
    _latest_version,
    curate_upsert_batch,
    curate_upsert_sink,
    read_curated,
    read_snapshot,
)
from debgpt7_8_with_vectordb_spark.tables import load_table

SF = "/root/testdata/sf0.001"
PAGES_SCHEMA = (
    "url_norm string, url string, fetched_at string, html string, "
    "domain string"
)


def _normalized_pages(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pages = _synth_warc(docs).filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    ).select(
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetched_at"),
        "html",
        # even docs carry the lowercase spelling (see _synth_warc)
        F.col("target_uri").startswith("http://").alias("_even"),
    )
    pages = robots_filter(pages, _robots_table(spark))
    pages = normalize_url_column(pages, "url").filter(
        F.col("url_norm").isNotNull()
    )
    return pages.select(
        "url_norm", "url", "fetched_at", "html", "domain", "_even"
    )


def _drain(spark, src_dir, table, ckpt):
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        curate_upsert_sink(stream, table, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_upsert_restart_order_and_batch_equality(spark, tmp_path):
    pages = _normalized_pages(spark).cache()
    even = pages.filter("_even").drop("_even")
    odd = pages.filter("NOT _even").drop("_even")

    src = str(tmp_path / "feed")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: only the even (earlier-fetch) spellings arrive
    even.coalesce(1).write.mode("overwrite").parquet(src)
    _drain(spark, src, table, ckpt)
    v0 = _latest_version(table)
    assert v0 is not None
    n_even = read_snapshot(spark, table).count()
    assert n_even == even.select("url_norm").distinct().count()

    # RESTART: a new drain from the same checkpoint picks up only the
    # newly arrived file (the odd spellings — all LOSE the min_by)
    odd.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, table, ckpt)
    assert _latest_version(table) > v0
    snap = read_snapshot(spark, table)
    assert snap.count() == n_even  # no new keys, no overwritten rows
    assert snap.filter(~F.col("fetched_at").endswith("00Z")).count() == 0

    # the snapshot's funnel tail == the batch operator end to end
    stream_rows = {
        tuple(r) for r in _curated_output(read_curated(spark, table)).collect()
    }
    batch_rows = {
        tuple(r) for r in QUERIES["curate_crawl"](spark, SF).collect()
    }
    assert stream_rows == batch_rows and stream_rows

    # crash replay: re-applying an already-published batch id is a
    # no-op even with poisoned content
    poison = spark.createDataFrame(
        [(
            "http://h1.example.org/page1",
            "http://h1.example.org/page1",
            "1999-01-01T00:00:00Z",
            "x",
            "d",
        )],
        PAGES_SCHEMA,
    )
    applied = curate_upsert_batch(
        spark, poison, _latest_version(table), table
    )
    assert applied is False
    assert read_snapshot(spark, table).count() == n_even

    # ingestion-order invariance: odd-first then even-first converges
    # to the identical snapshot (min_by associativity)
    table2 = str(tmp_path / "table2")
    src2 = str(tmp_path / "feed2")
    ckpt2 = str(tmp_path / "ckpt2")
    odd.coalesce(1).write.mode("overwrite").parquet(src2)
    _drain(spark, src2, table2, ckpt2)
    even.coalesce(1).write.mode("append").parquet(src2)
    _drain(spark, src2, table2, ckpt2)
    a = {tuple(r) for r in read_snapshot(spark, table).collect()}
    b = {tuple(r) for r in read_snapshot(spark, table2).collect()}
    assert a == b
    pages.unpersist()


def test_read_curated_without_snapshot_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_curated(spark, str(tmp_path / "nope"))


def test_same_timestamp_tiebreak_matches_batch(spark, tmp_path):
    """NOTES r9 #4: two spellings of one canonical URL fetched at the
    SAME instant — the streaming keep-rule must order by the raw url
    exactly like the batch operator, so both engines keep the
    lexicographically-first spelling regardless of arrival order."""
    rows = [
        ("http://h.example.org/p", "HTTP://H.Example.ORG:80/p",
         "2024-01-01T00:00:00Z", "<p>B spelling</p>", "example.org"),
        ("http://h.example.org/p", "http://h.example.org/p",
         "2024-01-01T00:00:00Z", "<p>A spelling</p>", "example.org"),
    ]
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "feed")
    # adversarial arrival order: uppercase spelling lands in batch 0
    spark.createDataFrame([rows[0]], PAGES_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame([rows[1]], PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, table, ckpt)
    snap = read_snapshot(spark, table).collect()
    assert len(snap) == 1
    assert snap[0]["url"] == "HTTP://H.Example.ORG:80/p"  # min raw url
    assert snap[0]["html"] == "<p>B spelling</p>"

    # batch keep-rule on the same rows picks the identical spelling
    batch = (
        spark.createDataFrame(rows, PAGES_SCHEMA)
        .groupBy("url_norm")
        .agg(
            F.min_by(
                F.struct("url", "html"),
                F.struct(
                    F.coalesce(F.col("fetched_at"), F.lit("￿")),
                    F.col("url"),
                ),
            ).alias("_k")
        )
        .collect()
    )
    assert batch[0]["_k"]["url"] == snap[0]["url"]
    assert batch[0]["_k"]["html"] == snap[0]["html"]


def test_upsert_migrates_pre_r9_snapshot_without_url_column(spark, tmp_path):
    """A snapshot published before the r9 state-struct widening carries
    (url_norm, fetched_at, html, domain) only; the first upsert against
    it must backfill the raw url (from url_norm) rather than fail
    resolution — restart durability over persisted state is the sink's
    whole contract."""
    from debgpt7_8_with_vectordb_spark.streaming.curate import (
        _snapshot_dir,
    )

    table = str(tmp_path / "table")
    os.makedirs(table, exist_ok=True)
    old = spark.createDataFrame(
        [("http://h.example.org/p", "2024-01-01T00:00:01Z",
          "<p>old</p>", "example.org")],
        "url_norm string, fetched_at string, html string, domain string",
    )
    old.coalesce(1).write.parquet(_snapshot_dir(table, 0))
    with open(os.path.join(table, "_LATEST"), "w") as fh:
        fh.write("0")

    batch = spark.createDataFrame(
        [("http://h.example.org/p", "HTTP://H.Example.ORG:80/p",
          "2024-01-01T00:00:00Z", "<p>new earlier</p>", "example.org")],
        PAGES_SCHEMA,
    )
    assert curate_upsert_batch(spark, batch, 1, table) is True
    snap = read_snapshot(spark, table).collect()
    assert len(snap) == 1
    # the earlier fetch wins; migrated rows carry url_norm as their url
    assert snap[0]["html"] == "<p>new earlier</p>"
    assert snap[0]["url"] == "HTTP://H.Example.ORG:80/p"

    # and the migrated OLD row can also win: replay with a later fetch
    table2 = str(tmp_path / "table2")
    os.makedirs(table2, exist_ok=True)
    old.coalesce(1).write.parquet(_snapshot_dir(table2, 0))
    with open(os.path.join(table2, "_LATEST"), "w") as fh:
        fh.write("0")
    later = spark.createDataFrame(
        [("http://h.example.org/p", "zzz://spelling",
          "2024-01-01T00:00:02Z", "<p>late</p>", "example.org")],
        PAGES_SCHEMA,
    )
    assert curate_upsert_batch(spark, later, 1, table2) is True
    snap2 = read_snapshot(spark, table2).collect()
    assert snap2[0]["html"] == "<p>old</p>"
    assert snap2[0]["url"] == "http://h.example.org/p"  # backfilled

    # EXACT fetched_at tie between a migrated (backfilled) row and a
    # genuine raw spelling: the genuine spelling must win even when the
    # synthetic lowercase form sorts lexicographically first — batch
    # parity on tie rows (ADVICE r9)
    table3 = str(tmp_path / "table3")
    os.makedirs(table3, exist_ok=True)
    old.coalesce(1).write.parquet(_snapshot_dir(table3, 0))
    with open(os.path.join(table3, "_LATEST"), "w") as fh:
        fh.write("0")
    tied = spark.createDataFrame(
        [("http://h.example.org/p", "HTTP://H.Example.ORG/p",
          "2024-01-01T00:00:01Z", "<p>tied real</p>", "example.org")],
        PAGES_SCHEMA,
    )
    assert curate_upsert_batch(spark, tied, 1, table3) is True
    snap3 = read_snapshot(spark, table3).collect()
    assert snap3[0]["url"] == "HTTP://H.Example.ORG/p"
    assert snap3[0]["html"] == "<p>tied real</p>"


def test_migration_flag_persists_across_batches(spark, tmp_path):
    """Code-review r10 finding: _mig must RIDE THE SNAPSHOT — a
    backfilled spelling that won batch 1 unopposed must STILL lose an
    exact fetched_at tie to a genuine raw spelling arriving batches
    later (dropping the flag at write time would let the synthetic
    lowercase form beat 'HTTP://...' on the raw-url tiebreak)."""
    from debgpt7_8_with_vectordb_spark.streaming.curate import (
        _snapshot_dir,
    )

    table = str(tmp_path / "table")
    os.makedirs(table, exist_ok=True)
    old = spark.createDataFrame(
        [("http://h.example.org/p", "2024-01-01T00:00:01Z",
          "<p>old</p>", "example.org")],
        "url_norm string, fetched_at string, html string, domain string",
    )
    old.coalesce(1).write.parquet(_snapshot_dir(table, 0))
    with open(os.path.join(table, "_LATEST"), "w") as fh:
        fh.write("0")

    # batch 1: unrelated URL — the migrated row wins its group unopposed
    other = spark.createDataFrame(
        [("http://other.example.org/x", "http://other.example.org/x",
          "2024-01-01T00:00:01Z", "<p>other</p>", "example.org")],
        PAGES_SCHEMA,
    )
    assert curate_upsert_batch(spark, other, 1, table) is True

    # batch 2: genuine raw spelling at the EXACT same fetched_at as the
    # (now snapshot-persisted) backfill — the genuine spelling must win
    tied = spark.createDataFrame(
        [("http://h.example.org/p", "HTTP://H.Example.ORG/p",
          "2024-01-01T00:00:01Z", "<p>tied real</p>", "example.org")],
        PAGES_SCHEMA,
    )
    assert curate_upsert_batch(spark, tied, 2, table) is True
    rows = {r["url_norm"]: r for r in read_snapshot(spark, table).collect()}
    assert rows["http://h.example.org/p"]["url"] == "HTTP://H.Example.ORG/p"
    assert rows["http://h.example.org/p"]["html"] == "<p>tied real</p>"
    assert rows["http://other.example.org/x"]["html"] == "<p>other</p>"
