"""WARC and ZIP-archive sources: forward-built fixtures (spec framing
written independently of the parser), plain + per-record-gzip WARC,
HTTP envelope stripping, suffix routing, truncation tolerance."""

from __future__ import annotations

import gzip
import io
import zipfile

import pytest

from debgpt7_8_with_vectordb_spark.sources.readers import (
    parse_warc_records,
    read_any_path,
    zip_member_texts,
)


def _warc_record(warc_type: str, body: bytes, **extra: str) -> bytes:
    headers = [f"WARC-Type: {warc_type}", f"Content-Length: {len(body)}"]
    headers += [f"{k.replace('_', '-')}: {v}" for k, v in extra.items()]
    head = "WARC/1.0\r\n" + "\r\n".join(headers) + "\r\n\r\n"
    return head.encode() + body + b"\r\n\r\n"


def _http(status: int, ctype: str, doc: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(doc)}\r\n\r\n"
    ).encode() + doc


def _crawl() -> bytes:
    html = b"<html><head><title>T</title></head><body><p>Grand &amp; page.</p></body></html>"
    return (
        _warc_record("warcinfo", b"software: test\r\n")
        + _warc_record(
            "response",
            _http(200, "text/html; charset=utf-8", html),
            WARC_Target_URI="https://example.org/a",
            WARC_Date="2024-01-02T03:04:05Z",
        )
        + _warc_record(
            "request",
            b"GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n",
            WARC_Target_URI="https://example.org/a",
        )
        + _warc_record(
            "response",
            _http(404, "text/plain", b"not here"),
            WARC_Target_URI="https://example.org/miss",
        )
    )


def test_warc_plain_records_and_html_text():
    recs = parse_warc_records(_crawl())
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "request", "response",
    ]
    page = recs[1]
    assert page["target_uri"] == "https://example.org/a"
    assert page["http_status"] == 200
    assert page["warc_date"] == "2024-01-02T03:04:05Z"
    assert "Grand & page." in page["text"] and "title" not in page["text"].lower()
    assert recs[3]["http_status"] == 404 and recs[3]["text"] == "not here"
    assert recs[2]["text"] is None  # requests carry no document text


def test_warc_gzip_variants():
    raw = _crawl()
    # single-stream gzip
    assert len(parse_warc_records(gzip.compress(raw))) == 4
    # per-record gzip members (the CommonCrawl convention)
    parts = [
        _warc_record("warcinfo", b"software: test\r\n"),
        _warc_record(
            "response",
            _http(200, "text/html", b"<p>hi</p>"),
            WARC_Target_URI="https://example.org/b",
        ),
    ]
    multi = b"".join(gzip.compress(p) for p in parts)
    recs = parse_warc_records(multi)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["text"] == "hi"


def test_warc_truncation_and_garbage():
    raw = _crawl()
    assert parse_warc_records(b"not a warc") == []
    assert parse_warc_records(b"") == []
    # cutting mid-record keeps the complete prefix records
    cut = raw[: len(raw) - 30]
    recs = parse_warc_records(cut)
    assert 1 <= len(recs) < 4


def test_zip_member_routing():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("docs/a.txt", "plain alpha")
        z.writestr("docs/b.html", "<body><p>beta &gt; gamma</p></body>")
        z.writestr("img/c.png", b"\x89PNG....".decode("latin-1"))
        z.writestr("notes.md", "# heading")
    got = dict(zip_member_texts(buf.getvalue()))
    assert got["docs/a.txt"] == "plain alpha"
    assert got["docs/b.html"] == "beta > gamma"
    assert got["notes.md"] == "# heading"
    assert "img/c.png" not in got  # binary member skipped
    assert zip_member_texts(b"not a zip") == []


@pytest.fixture(scope="module")
def spark():
    from debgpt7_8_with_vectordb_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def test_sources_end_to_end(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("crawl")
    (root / "shard.warc.gz").write_bytes(gzip.compress(_crawl()))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("x.txt", "zipped text")
    (root / "dump.zip").write_bytes(buf.getvalue())

    warc_rows = read_any_path(spark, f"{root}/shard.warc.gz").collect()
    assert len(warc_rows) == 4
    ok = [r for r in warc_rows if r["http_status"] == 200]
    assert ok and "Grand & page." in ok[0]["text"]

    zip_rows = read_any_path(spark, f"{root}/dump.zip").collect()
    assert len(zip_rows) == 1 and zip_rows[0]["content"] == "zipped text"
    assert zip_rows[0]["member"] == "x.txt"


# ------------------------------------------------------------- tarballs


def test_tar_member_routing_and_compressions():
    import tarfile

    from debgpt7_8_with_vectordb_spark.sources.readers import (
        tar_member_texts,
    )

    def tarball(mode):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode=mode) as tf:
            def add(name, data: bytes):
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))

            add("a/doc.txt", b"tar plain text")
            add("a/page.html", b"<p>tar &amp; html</p>")
            add("bin.dat", b"\x00\x01\x02")
        return buf.getvalue()

    for mode in ("w", "w:gz", "w:bz2", "w:xz"):
        got = dict(tar_member_texts(tarball(mode)))
        assert got["a/doc.txt"] == "tar plain text", mode
        assert got["a/page.html"] == "tar & html", mode
        assert "bin.dat" not in got
    assert tar_member_texts(b"not a tar") == []


def test_tar_source_end_to_end(spark, tmp_path_factory):
    import tarfile

    root = tmp_path_factory.mktemp("tars")
    with tarfile.open(root / "dump.tar.gz", "w:gz") as tf:
        data = b"from the tarball."
        ti = tarfile.TarInfo("x.md")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
    rows = read_any_path(spark, f"{root}/dump.tar.gz").collect()
    assert len(rows) == 1
    assert rows[0]["member"] == "x.md"
    assert rows[0]["content"] == "from the tarball."
