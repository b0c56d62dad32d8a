"""CLI-level tests — main() invoked with argv lists, the reference's own
CLI test style (test_vectordb.py:184-241)."""

from __future__ import annotations

import json

from debgpt7_8_with_vectordb_spark.cli import main


def test_cli_retrieve_self_similarity(spark, sf_dir, capsys):
    rc = main(["retrieve", "--sf-dir", sf_dir, "--query-id", "0", "-k", "3"])
    assert rc == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3
    top = max(rows, key=lambda r: r["score"])
    assert top["vec_id"] == 0 and abs(top["score"] - 1.0) < 1e-9


def test_cli_dump_writes_jsonl(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "dump")
    rc = main(["dump", "--sf-dir", sf_dir, "--out", out])
    assert rc == 0
    dumped = spark.read.json(out)
    assert dumped.count() > 0
    assert "vector" not in dumped.columns  # include_vector=False semantics
    assert {"id", "source", "text"} <= set(dumped.columns)


def test_cli_dedup_new_methods(spark, sf_dir, capsys):
    import json as _json

    rc = main(["dedup", "--sf-dir", sf_dir, "--method", "mixture", "--limit", "3"])
    assert rc == 0
    rows = [_json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert rows and {"lang", "source", "n_docs", "frac_tokens"} <= set(rows[0])
    rc = main(
        ["dedup", "--sf-dir", sf_dir, "--method", "decontaminate", "--limit", "3"]
    )
    assert rc == 0
    rows = [_json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["n_shared"] < 5 for r in rows)


def test_cli_dedup_exact(spark, sf_dir, capsys):
    rc = main(["dedup", "--sf-dir", sf_dir, "--method", "exact", "--limit", "5"])
    assert rc == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(rows) <= 5
    assert {"digest", "keep_id", "dup_count"} <= set(rows[0])


def test_cli_unknown_query_exits_2(spark, sf_dir, capsys):
    rc = main(["query", "--sf-dir", sf_dir, "--name", "nope"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "unknown query" in err and "available" in err


def test_cli_does_not_stop_ambient_session(spark, sf_dir):
    main(["query", "--sf-dir", sf_dir, "--name", "group_counts", "--limit", "1"])
    # the shared fixture session must survive the CLI call
    assert spark.range(3).count() == 3


def test_cli_compact(spark, sf_dir, tmp_path, capsys):
    from debgpt7_8_with_vectordb_spark.sinks import write_corpus
    from debgpt7_8_with_vectordb_spark.tables import load_table

    out = str(tmp_path / "corpus")
    write_corpus(
        load_table(spark, sf_dir, "documents"),
        out,
        partition_by=("lang",),
        max_records_per_file=7,
    )
    rc = main(["compact", "--path", out, "--target-mb", "1024"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["compacted"]  # tiny shards were merged
    assert summary["n_shards"] == len(summary["compacted"])
    assert summary["n_rows"] == spark.read.parquet(out).count()


def test_cli_curate_end_to_end(spark, tmp_path, capsys):
    """WARC shard -> curated JSONL, report, and the documents-table
    bridge — the crawl head as one CLI job (round 8)."""
    import json

    def rec(warc_type, body, **extra):
        headers = [f"WARC-Type: {warc_type}", f"Content-Length: {len(body)}"]
        headers += [f"{k.replace('_', '-')}: {v}" for k, v in extra.items()]
        head = "WARC/1.0\r\n" + "\r\n".join(headers) + "\r\n\r\n"
        return head.encode() + body + b"\r\n\r\n"

    def http(doc):
        return (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(doc)}\r\n\r\n"
        ).encode() + doc

    body = ("lorem " * 40).strip().encode()
    page = b"<html><body><p>" + body + b"</p></body></html>"
    other = b"<html><body><p>" + body + b" distinct</p></body></html>"
    shard = (
        rec("response", http(page),
            WARC_Target_URI="https://ok.example.org/a",
            WARC_Date="2024-01-01T00:00:00Z")
        + rec("response", http(page),  # same content, later spelling
              WARC_Target_URI="HTTPS://OK.example.org:443/a",
              WARC_Date="2024-01-01T00:00:01Z")
        + rec("response", http(other),  # distinct content: survives the
              # mirror (content-digest) dedup when robots doesn't drop it
              WARC_Target_URI="https://blocked.example.org/private/x",
              WARC_Date="2024-01-01T00:00:02Z")
    )
    (tmp_path / "crawl.warc").write_bytes(shard)
    robots = tmp_path / "robots.jsonl"
    robots.write_text(json.dumps(
        {"host": "blocked.example.org",
         "robots_txt": "User-agent: *\nDisallow: /private"}) + "\n")

    rc = main([
        "curate", "--warc", str(tmp_path / "crawl.warc"),
        "--robots", str(robots), "--sf-dir", "unused",
    ])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert len(rows) == 1  # URL dedup collapsed the pair; robots dropped one
    assert rows[0]["url"] == "https://ok.example.org/a"
    assert rows[0]["fetched_at"] == "2024-01-01T00:00:00Z"  # first fetch won

    out = str(tmp_path / "docs")
    rc = main([
        "curate", "--warc", str(tmp_path / "crawl.warc"),
        "--to-documents", "--out", out, "--sf-dir", "unused",
    ])
    assert rc == 0
    docs = spark.read.parquet(out)
    assert docs.count() == 2  # no robots table -> /private page kept
    assert set(docs.columns) == {"doc_id", "source", "lang", "ts", "text"}

    rc = main([
        "curate", "--warc", str(tmp_path / "crawl.warc"),
        "--report", "--sf-dir", "unused",
    ])
    assert rc == 0
    report = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    # the captured buffer still holds the prior run's {"written": ...}
    assert any(r.get("domain") == "example.org" for r in report)
