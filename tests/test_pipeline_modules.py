"""Tests for the sources / streaming / embedding pipeline modules."""

from __future__ import annotations

import json
import math

import pytest
import pyspark.sql.functions as F


# ---------- sources ----------


def test_source_router_parquet(spark, sf_dir):
    from debgpt7_8_with_vectordb_spark.sources.readers import read_any_path

    df = read_any_path(spark, f"{sf_dir}/documents.parquet")
    assert df.columns == ["path", "content"]
    assert df.count() == spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def test_source_dir_skiplist(spark, tmp_path):
    from debgpt7_8_with_vectordb_spark.sources.readers import read_directory

    (tmp_path / "keep.txt").write_text("kept")
    git = tmp_path / ".git"
    git.mkdir()
    (git / "HEAD").write_text("ref: refs/heads/main")
    df = read_directory(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["content"] == "kept"


def test_source_jsonl_and_bad_columns(spark, tmp_path):
    from debgpt7_8_with_vectordb_spark.sources.readers import read_jsonl

    good = tmp_path / "good.jsonl"
    good.write_text(json.dumps({"source": "a", "text": "hello"}) + "\n")
    assert read_jsonl(spark, str(good)).collect()[0]["content"] == "hello"

    bad = tmp_path / "bad.jsonl"
    bad.write_text(json.dumps({"a": 1}) + "\n")
    with pytest.raises(ValueError, match="jsonl source needs"):
        read_jsonl(spark, str(bad))


def test_source_registry_dispatch(spark, sf_dir, tmp_path):
    from debgpt7_8_with_vectordb_spark.sources.registry import read

    df = read(spark, f"parquet_docs:{sf_dir}/documents.parquet")
    assert df.columns == ["path", "content"]
    # specs without a registered prefix fall through to the path router
    # (reference reader.py:989-1032 semantics)
    f = tmp_path / "plain.txt"
    f.write_text("plain text")
    assert read(spark, str(f)).collect()[0]["content"] == "plain text"


def test_injected_pdf_decoder_through_arrow_seam(spark, tmp_path):
    """S9 decode seam (reference reader.py:310-333 pypdf): the container
    lacks pypdf, so a FAKE decoder is injected through the same
    mapInPandas slot a real one uses — bytes must arrive intact on the
    executor and the extracted text must flow back through Arrow."""
    import pytest

    from debgpt7_8_with_vectordb_spark.sources.readers import (
        pdf_decode_stub,
        read_any_path,
    )

    (tmp_path / "a.pdf").write_bytes(b"%PDF-1.4 alpha body")
    (tmp_path / "b.pdf").write_bytes(b"%PDF-1.4 beta")

    # closure, not module-level fn: test modules aren't importable on workers
    def fake_pypdf(payload: bytes) -> str:
        assert payload.startswith(b"%PDF"), "decoder must see the raw bytes"
        return f"pages=1 text={payload[9:].decode()} bytes={len(payload)}"

    rows = {
        r["path"].rsplit("/", 1)[-1]: r["content"]
        for r in read_any_path(spark, str(tmp_path / "*.pdf"), decoder=fake_pypdf).collect()
    }
    assert rows == {
        "a.pdf": "pages=1 text=alpha body bytes=19",
        "b.pdf": "pages=1 text=beta bytes=13",
    }
    # the default slot is the honest stub, not a silent fake
    with pytest.raises(NotImplementedError):
        pdf_decode_stub(b"%PDF")


def test_injected_html_extractor_and_default_strip(spark, tmp_path):
    """HTML source: default since round 7 = the bs4-grade tokenizer
    (block-element newlines, interior spacing preserved); fast=True
    keeps the JVM regexp strip; a custom extractor injects through the
    identical Arrow seam."""
    from debgpt7_8_with_vectordb_spark.sources.readers import read_html

    f = tmp_path / "page.html"
    f.write_text("<html><body><h1>Title</h1><p>Hello   world</p></body></html>")

    assert (
        read_html(spark, str(f)).collect()[0]["content"]
        == "Title\n\nHello   world"
    )
    assert (
        read_html(spark, str(f), fast=True).collect()[0]["content"]
        == "Title Hello world"
    )

    def fake_bs4(payload: bytes) -> str:
        # stands in for BeautifulSoup(payload).get_text(" ", strip=True)
        import re

        return "|".join(
            t for t in re.split(r"<[^>]+>", payload.decode()) if t.strip()
        )

    assert (
        read_html(spark, str(f), extractor=fake_bs4).collect()[0]["content"]
        == "Title|Hello   world"
    )


# ---------- streaming ----------


def test_stream_sessions_match_batch_gap_sessions(spark, sf_dir):
    """The streaming session_window operator must produce exactly the
    sessions the batch gap-session SQL defines (same gap)."""
    from debgpt7_8_with_vectordb_spark.streaming.sessionize import (
        sessionize_stream,
        stream_events_from_dir,
    )
    from debgpt7_8_with_vectordb_spark.tables import load_table

    ev = stream_events_from_dir(spark, sf_dir, glob="events.parquet")
    sess = sessionize_stream(ev, gap="1 hour", watermark="2 hours")
    q = (
        sess.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("t_sessions")

    batch_ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = batch_ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) >= F.expr("INTERVAL 1 HOUR")),
            1,
        ).otherwise(0),
    )
    sids = flagged.withColumn(
        "sid", F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    batch = sids.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        (F.max("ts") + F.expr("INTERVAL 1 HOUR")).alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    )

    assert streamed.count() == batch.count()
    sk = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in streamed.collect()
    }
    bk = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    assert sk == bk


def test_incremental_index_build_idempotent_per_batch(spark, sf_dir, tmp_path):
    from debgpt7_8_with_vectordb_spark.streaming.sessionize import (
        incremental_index_build,
        read_index,
        stream_events_from_dir,
    )

    def embed_batch(df):
        return df.select(
            "event_id", F.array(F.col("value"), F.lit(1.0)).alias("vector")
        )

    ev = stream_events_from_dir(spark, sf_dir, glob="events.parquet")
    q = incremental_index_build(
        ev, embed_batch, str(tmp_path / "idx"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    built = read_index(spark, str(tmp_path / "idx"))
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert built.count() == n_events
    assert built.columns == ["event_id", "vector"]

    # restart with the same checkpoint: no new files → no duplicate rows
    ev2 = stream_events_from_dir(spark, sf_dir, glob="events.parquet")
    q2 = incremental_index_build(
        ev2, embed_batch, str(tmp_path / "idx"), str(tmp_path / "ckpt")
    )
    q2.awaitTermination()
    assert read_index(spark, str(tmp_path / "idx")).count() == n_events

    # a FAILED-AND-REPLAYED micro-batch reruns handle() with the same
    # batch_id against the existing sink (simulated by a fresh
    # checkpoint, which reprocesses the input as batch 0); the
    # per-batch-partition overwrite must not double rows
    ev3 = stream_events_from_dir(spark, sf_dir, glob="events.parquet")
    q3 = incremental_index_build(
        ev3, embed_batch, str(tmp_path / "idx"), str(tmp_path / "ckpt_replay")
    )
    q3.awaitTermination()
    assert read_index(spark, str(tmp_path / "idx")).count() == n_events


# ---------- embedding ----------


def test_provider_embed_matches_expression_path(spark, sf_dir):
    """mapInPandas provider path ≡ pure-Catalyst expression path."""
    from debgpt7_8_with_vectordb_spark.operators.embedding import (
        hash_embed_expr,
        hash_provider_8,
        provider_embed,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.col("text").alias("content"))
        .limit(20)
    )
    via_udf = provider_embed(docs, hash_provider_8, dim=8)
    via_expr = docs.select(
        "doc_id", hash_embed_expr(F.col("content"), 8).alias("vector")
    )
    u = {r["doc_id"]: r["vector"] for r in via_udf.collect()}
    e = {r["doc_id"]: r["vector"] for r in via_expr.collect()}
    assert u.keys() == e.keys()
    for k in u:
        assert u[k] == pytest.approx(e[k], abs=1e-9)


def test_provider_embed_truncates_and_normalizes(spark):
    from debgpt7_8_with_vectordb_spark.operators.embedding import provider_embed

    docs = spark.createDataFrame(
        [(1, "abc")], "doc_id long, content string"
    )

    def wide_provider(texts):
        return [[3.0, 4.0, 99.0, 99.0] for _ in texts]

    out = provider_embed(docs, wide_provider, dim=2).collect()[0]["vector"]
    # truncated to [3,4] then normalized → [0.6, 0.8] (vectordb.py:81-86 invariant)
    assert out == pytest.approx([0.6, 0.8])


def test_bulk_index_build_partition_pruning_layout(spark, sf_dir, tmp_path):
    from debgpt7_8_with_vectordb_spark.operators.embedding import bulk_index_build

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "index")
    bulk_index_build(docs, out, dim=16)
    idx = spark.read.parquet(out)
    assert idx.count() == docs.count()
    assert set(idx.columns) == {"id", "text", "vector", "cluster_id"}
    # unit vectors
    row = idx.first()
    assert math.isqrt(0) == 0  # keep math import honest
    norm = math.sqrt(sum(x * x for x in row["vector"]))
    assert norm == pytest.approx(1.0, abs=1e-6)
    # cluster_id is a physical partition column → probe-side cluster
    # pruning is partition pruning
    some_cluster = idx.first()["cluster_id"]
    one = idx.filter(F.col("cluster_id") == some_cluster)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cluster_id" in plan or (
        f"cluster_id={some_cluster}" in str(one.inputFiles())
    )


def test_bulk_index_bucket_is_geometric(spark, tmp_path):
    """The partition key must follow vector GEOMETRY (ADVICE r1: a
    text-hash bucket probes at near-zero recall): a vector's own bucket
    must contain its exact-duplicate text, and a home-bucket probe must
    retrieve the duplicate as top hit."""
    from debgpt7_8_with_vectordb_spark.operators.embedding import (
        bulk_index_build,
        probe_bulk_index,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 7}") for i in range(100)]
        + [(1000, "document number 42 about topic 0")],  # exact dup text of 42
        "doc_id long, text string",
    )
    out = str(tmp_path / "geo_index")
    bulk_index_build(docs, out, dim=16)

    idx = spark.read.parquet(out)
    by_id = {r["id"]: (r["cluster_id"], r["vector"]) for r in idx.collect()}
    # identical text → identical embedding → identical bucket, always
    assert by_id[42][0] == by_id[1000][0]

    # probing ONLY the query's home bucket still finds the duplicate
    got = probe_bulk_index(spark, out, list(by_id[42][1]), topk=2).collect()
    assert {r["id"] for r in got} == {42, 1000}
    assert all(r["score"] == pytest.approx(1.0, abs=1e-6) for r in got)
    # and the probe read only the home partition (pruning, not a scan)
    probed = probe_bulk_index(spark, out, list(by_id[42][1]), topk=2)
    files = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in files


def test_provider_embed_bounded_retry(spark, tmp_path):
    """M5: a transient provider failure recovers within the bounded
    retry loop (closure providers cloudpickle by VALUE — a test-module
    function would pickle by reference and fail to import on workers)."""
    from debgpt7_8_with_vectordb_spark.operators.embedding import provider_embed

    marker = str(tmp_path / "flaky_marker")

    def flaky_provider(texts):
        import os

        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("tripped")
            raise RuntimeError("simulated rate limit")
        return [[float(len(t)), 1.0] for t in texts]

    docs = spark.createDataFrame(
        [(1, "ab"), (2, "cdef")], "doc_id long, content string"
    ).coalesce(1)
    out = provider_embed(docs, flaky_provider, dim=2, backoff_s=0.01)
    rows = {r["doc_id"]: r["vector"] for r in out.collect()}
    assert len(rows) == 2  # retry recovered from the simulated rate limit
    # [len, 1] normalized
    n = (2.0**2 + 1) ** 0.5
    assert rows[1] == pytest.approx([2 / n, 1 / n])


def test_provider_embed_retry_exhaustion_raises(spark):
    from debgpt7_8_with_vectordb_spark.operators.embedding import provider_embed

    def always_failing(texts):
        raise RuntimeError("permanent outage")

    docs = spark.createDataFrame([(1, "x")], "doc_id long, content string")
    out = provider_embed(docs, always_failing, dim=2, max_attempts=2, backoff_s=0.0)
    with pytest.raises(Exception, match="permanent outage"):
        out.collect()


# ---------- fanout ----------


def test_fanout_expand_fetch_clean(spark):
    """S15/S16 fan-out: range expansion → distributed fetch (injected
    transport, bounded retry) → status filter + whitespace cleanup."""
    from debgpt7_8_with_vectordb_spark.sources.fanout import (
        clean_fetched,
        expand_month_range,
        fetch_urls,
    )

    urls = expand_month_range(spark, ["debian-devel", "debian-user"], "2021-2023", [4, 5])
    assert urls.count() == 2 * 3 * 2  # lists × years × months
    assert urls.filter(F.col("url").contains("/2022/04/")).count() == 2

    def fake_fetcher(url):
        if "debian-user" in url:
            return 404, ""
        return 200, "line one   \n\n\n\nline two  "

    fetched = fetch_urls(urls, fake_fetcher, partitions=4)
    docs = clean_fetched(fetched).collect()
    assert len(docs) == 6  # 404s dropped
    assert all(d["content"] == "line one\n\nline two" for d in docs)


def test_fanout_retry_counts_failures(spark):
    from debgpt7_8_with_vectordb_spark.sources.fanout import fetch_urls

    urls = spark.createDataFrame([("http://x/1",)], "url string")

    def always_500(url):
        return 500, "err"

    rows = fetch_urls(urls, always_500).collect()
    assert rows[0]["status"] == 500  # bounded retry gave up, status surfaced


# ---------- custom stateful streaming ----------


def test_stateful_running_profiles_match_batch(spark, sf_dir):
    """applyInPandasWithState per-user profiles: after draining the feed,
    the latest profile per user equals the batch groupBy answer."""
    from debgpt7_8_with_vectordb_spark.streaming.sessionize import (
        stream_events_from_dir,
    )
    from debgpt7_8_with_vectordb_spark.streaming.stateful import running_profiles
    from debgpt7_8_with_vectordb_spark.tables import load_table

    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        ev = stream_events_from_dir(spark, sf_dir, glob="events.parquet")
        prof = running_profiles(ev, idle_timeout_ms=None)
        q = (
            prof.writeStream.format("memory")
            .queryName("t_profiles")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    got = {
        r["user_id"]: r
        for r in spark.table("t_profiles").orderBy("user_id").collect()
    }
    batch = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("tv"), F.max("ts").alias("mx")
    )
    for b in batch.collect():
        g = got[b["user_id"]]
        assert g["n_events"] == b["n"]
        assert abs(g["total_value"] - b["tv"]) < 1e-6
        assert g["last_ts"] == b["mx"]
        assert g["final"] is False  # drained before any idle timeout fired


def test_source_cmd(spark):
    """S12: command stdout becomes one document row."""
    from debgpt7_8_with_vectordb_spark.sources.readers import read_cmd

    df = read_cmd(spark, "echo hello-from-cmd")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["content"].strip() == "hello-from-cmd"
    assert rows[0]["path"] == "cmd:echo hello-from-cmd"


def test_source_stdin(spark, monkeypatch):
    """S13: stdin becomes one document row."""
    import io

    from debgpt7_8_with_vectordb_spark.sources import readers

    monkeypatch.setattr("sys.stdin", io.StringIO("piped content"))
    rows = readers.read_stdin(spark, "").collect()
    assert len(rows) == 1 and rows[0]["content"] == "piped content"


def test_source_man_tldr_prefixes(spark, monkeypatch):
    """S21 prefix parity (reference reader.py:962-969, 1010-1016):
    ``man:X`` / ``tldr:X`` are ``cmd`` specializations running
    ``man X`` / ``tldr X`` with the page name as the document label.
    The binaries aren't in this container, so the subprocess seam is
    stubbed and the constructed argv is pinned instead — shlex-split
    argv, NO shell (reference reader.py:546,964,1012): section-qualified
    specs like ``man:2 printf`` become separate argv elements, and a
    hostile spec like ``man:x; rm -rf ~`` reaches man as arguments,
    never a shell."""
    from debgpt7_8_with_vectordb_spark.sources import readers
    from debgpt7_8_with_vectordb_spark.sources.registry import read

    calls = []

    class _Out:
        stdout = "FAKE PAGE"

    def fake_run(cmd, **kw):
        calls.append((cmd, kw.get("shell", False)))
        return _Out()

    monkeypatch.setattr(readers.subprocess, "run", fake_run)
    rows = read(spark, "man:grep").collect()
    assert calls[-1] == (["man", "grep"], False)
    assert len(rows) == 1
    assert rows[0]["path"] == "man:grep"
    assert rows[0]["content"] == "FAKE PAGE"

    rows = read(spark, "tldr:curl").collect()
    assert calls[-1] == (["tldr", "curl"], False)
    assert rows[0]["path"] == "tldr:curl" and rows[0]["content"] == "FAKE PAGE"

    # section-qualified spec: separate argv elements (reference shlex)
    read(spark, "man:2 printf").collect()
    assert calls[-1] == (["man", "2", "printf"], False)

    # a hostile page name becomes plain arguments — never a shell line
    read(spark, "man:x; rm -rf ~").collect()
    assert calls[-1] == (["man", "x;", "rm", "-rf", "~"], False)

    # unbalanced quotes (shlex ValueError) degrade to an empty document
    # like a missing binary — graceful, never a crash (ADVICE r9)
    rows = read(spark, "man:don't").collect()
    assert rows[0]["path"] == "man:don't" and rows[0]["content"] == ""
    rows = read(spark, "tldr:it's").collect()
    assert rows[0]["path"] == "tldr:it's" and rows[0]["content"] == ""


def test_generation_backend_registry_dispatch(spark):
    """Reference backends.py:121-139: dispatch by (case-insensitive)
    name, ValueError naming the unknown backend."""
    import pytest

    from debgpt7_8_with_vectordb_spark.operators.generation import (
        generate_with_backend,
    )

    df = spark.createDataFrame([(1, "abcdef")], "id long, prompt string")
    assert generate_with_backend(df, "echo").first()["reply"] == "ace"
    assert generate_with_backend(df, "REVERSE").first()["reply"] == "fedcba"
    with pytest.raises(ValueError, match="Unknown backend: nope"):
        generate_with_backend(df, "nope")
