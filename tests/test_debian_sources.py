"""Round-8 S21 completion: the Debian-surface source prefixes
(bts/archwiki/buildd/google/ldo/policy/devref/nm/sbuild) dispatch
through the registry with injected transports — full prefix parity with
the reference's routing table (reader.py:842-1032)."""

from __future__ import annotations

import pytest

from debgpt7_8_with_vectordb_spark.sources import debian as D
from debgpt7_8_with_vectordb_spark.sources.registry import read


@pytest.fixture(autouse=True)
def _restore_seams():
    orig_f, orig_s, orig_t = D._FETCHER, D._SEARCHER, D._NM_TEMPLATES
    yield
    D._FETCHER, D._SEARCHER, D._NM_TEMPLATES = orig_f, orig_s, orig_t


def test_bts_page_and_src_truncation(spark):
    calls = []

    def fake(url):
        calls.append(url)
        if "src:" in url:
            return 200, (
                "<html><body><p>bug one</p><p>bug two</p>"
                "<p>Options</p><p>chrome to drop</p></body></html>"
            )
        return 200, "<html><body><p>report body</p></body></html>"

    D.set_fetcher(fake)
    rows = read(spark, "bts:123456").collect()
    assert calls[-1] == "https://bugs.debian.org/123456"
    assert rows[0]["path"] == "bts:123456"
    assert "report body" in rows[0]["content"]

    rows = read(spark, "bts:src:debgpt").collect()
    assert calls[-1] == "https://bugs.debian.org/src:debgpt"
    assert "bug two" in rows[0]["content"]
    assert "Options" not in rows[0]["content"]  # trailing chrome cut
    assert "chrome to drop" not in rows[0]["content"]


def test_archwiki_and_buildd_urls(spark):
    calls = []

    def fake(url):
        calls.append(url)
        return 200, "<html><body>page text   </body></html>"

    D.set_fetcher(fake)
    rows = read(spark, "archwiki:Archiving_and_compression").collect()
    assert calls[-1] == (
        "https://wiki.archlinux.org/title/Archiving_and_compression"
    )
    assert rows[0]["content"].strip() == "page text"
    read(spark, "buildd:debgpt").collect()
    assert calls[-1] == "https://buildd.debian.org/status/package.php?p=debgpt"


def test_google_searcher_fanout(spark):
    def fake(url):
        return 200, f"<html><body>content of {url}</body></html>"

    D.set_fetcher(fake)
    D.set_searcher(lambda q: [f"https://r/{q}/1", f"https://r/{q}/2"])
    rows = {r["path"]: r["content"] for r in read(spark, "google:spark").collect()}
    assert set(rows) == {"https://r/spark/1", "https://r/spark/2"}
    assert "content of https://r/spark/1" in rows["https://r/spark/1"]


def test_google_without_searcher_raises(spark):
    D._SEARCHER = None
    with pytest.raises(RuntimeError, match="search seam"):
        read(spark, "google:anything")


def test_ldo_spec_expansion():
    assert D.expand_ldo_spec("debian-ai/2024/11") == ["debian-ai/2024/11"]
    assert D.expand_ldo_spec("debian-ai/2024,2025/11") == [
        "debian-ai/2024/11", "debian-ai/2025/11",
    ]
    assert D.expand_ldo_spec("debian-ai/2025/01:03") == [
        "debian-ai/2025/01", "debian-ai/2025/02", "debian-ai/2025/03",
    ]
    assert len(D.expand_ldo_spec("a,b/2024:2025/:")) == 2 * 2 * 12


def test_ldo_thread_walk_with_next_page(spark):
    def fake(url):
        if url.endswith("/threads.html"):
            return 200, (
                '<a href="msg00001.html">t1</a>'
                '<a href="threads2.html">next page</a>'
            )
        if url.endswith("/threads2.html"):
            return 200, '<a href="msg00002.html">t2</a>'
        return 200, f"<html><body>mail at {url}</body></html>"

    D.set_fetcher(fake)
    rows = {r["path"] for r in read(spark, "ldo:debian-ai/2024/11").collect()}
    assert rows == {
        "https://lists.debian.org/debian-ai/2024/11/msg00001.html",
        "https://lists.debian.org/debian-ai/2024/11/msg00002.html",
    }


_MANUAL = """Some preamble.

1. First chapter
****************

chapter text

1.1. First section
==================

section text

1.1.1. Deep sub
---------------

deep text

1.2. Second section
===================

more text

2. Second chapter
*****************

closing text
"""


def test_manual_section_split_semantics():
    sections = dict(D.split_manual_sections(_MANUAL))
    assert set(sections) == {"1", "1.1", "1.1.1", "1.2", "2"}
    # a level-1 section spans its subsections, ending at the next '***'
    assert "deep text" in sections["1"] and "more text" in sections["1"]
    assert "closing text" not in sections["1"]
    # a level-2 section ends at the next '===' even across a '---'
    assert "deep text" in sections["1.1"]
    assert "more text" not in sections["1.1"]
    assert sections["2"].startswith("2. Second chapter")


def test_policy_and_devref_dispatch(spark):
    calls = []

    def fake(url):
        calls.append(url)
        return 200, _MANUAL

    D.set_fetcher(fake)
    rows = read(spark, "policy:").collect()
    assert calls[-1] == D.POLICY_URL
    assert {r["path"] for r in rows} == {
        "policy:1", "policy:1.1", "policy:1.1.1", "policy:1.2", "policy:2",
    }
    one = read(spark, "policy:1.2").collect()
    assert len(one) == 1 and "more text" in one[0]["content"]
    whole = read(spark, "devref:all").collect()
    assert calls[-1] == D.DEVREF_URL
    assert whole[0]["path"] == "devref:all" and "preamble" in whole[0]["content"]
    with pytest.raises(KeyError):
        read(spark, "policy:9.9")


def test_nm_templates(spark):
    D.set_nm_templates({"pp1.PH7": "the licensing question text"})
    rows = read(spark, "nm:pp1.PH7").collect()
    assert rows[0] == ("nm:pp1.PH7", "the licensing question text")
    with pytest.raises(KeyError):
        read(spark, "nm:unknown-key")


def test_sbuild_newest_and_slice(spark, tmp_path, monkeypatch):
    old = tmp_path / "old.build"
    new = tmp_path / "new.build"
    banner = lambda t: f"+{'-'*10}+\n| {t}    |\n+{'-'*10}+"  # noqa: E731
    old.write_text("old log")
    new.write_text(
        "preamble\n" + banner("Build") + "\nthe build body\n"
        + banner("Changes") + "\ntrailing"
    )
    import os
    os.utime(old, (1, 1))
    monkeypatch.chdir(tmp_path)
    rows = read(spark, "sbuild:").collect()
    assert rows[0]["path"] == f"sbuild:{new.name}" or rows[0]["path"].endswith(
        "new.build"
    )
    assert rows[0]["content"].strip() == "the build body"
    explicit = read(spark, f"sbuild:{old}").collect()
    assert explicit[0]["content"] == "old log"  # no banners: whole file

    # truncated/failed log: Build banner present but no Changes table —
    # slice from the Build banner to EOF (reference
    # reader.py:extract_build_changes), not the entire log
    trunc = tmp_path / "trunc.build"
    trunc.write_text(
        "preamble noise\n" + banner("Build") + "\nfailed mid-build\ntail"
    )
    got = read(spark, f"sbuild:{trunc}").collect()
    assert got[0]["content"].strip() == "failed mid-build\ntail"
    assert "preamble noise" not in got[0]["content"]


def test_bare_url_and_file_and_dash_dispatch(spark, tmp_path, monkeypatch):
    """Reference reader.py:834-841 + 1018: bare http(s):// specs fetch
    (HTML reduced to text, other bodies raw), file:// routes to the
    path source, '-' is stdin."""
    def fake(url):
        if url.endswith(".html"):
            return 200, "<html><body><p>web words</p></body></html>"
        return 200, "plain body"

    D.set_fetcher(fake)
    rows = read(spark, "https://example.org/x.html").collect()
    assert rows[0]["path"] == "https://example.org/x.html"
    assert rows[0]["content"] == "web words"
    rows = read(spark, "http://example.org/raw.txt").collect()
    assert rows[0]["content"] == "plain body"

    f = tmp_path / "doc.txt"
    f.write_text("local file words")
    rows = read(spark, f"file://{f}").collect()
    assert rows[0]["content"].strip() == "local file words"

    import io
    monkeypatch.setattr("sys.stdin", io.StringIO("piped via dash"))
    rows = read(spark, "-").collect()
    assert rows[0]["content"] == "piped via dash"


def test_manual_split_properties():
    """Hypothesis: for any generated manual (random section tree with
    dotted numbering + matching underline levels), every emitted index
    is unique, every body starts with its own header line, and the
    level-1 bodies partition the document's section lines (no line of a
    chapter appears in a sibling chapter)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    seps = {1: "*", 2: "=", 3: "-"}

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=3), min_size=1,
                    max_size=12))
    def check(levels):
        # force the tree to start at level 1 and never skip levels down
        counters = [0, 0, 0]
        lines = ["preamble text", ""]
        indexes = []
        for lv in levels:
            lv = min(lv, 1 + max(
                (i + 1 for i, c in enumerate(counters) if c), default=0))
            counters[lv - 1] += 1
            for j in range(lv, 3):
                counters[j] = 0
            idx = ".".join(str(c) for c in counters[:lv])
            indexes.append(idx)
            header = f"{idx}. Title"
            lines += [header, seps[lv] * len(header), f"body of {idx}", ""]
        sections = D.split_manual_sections("\n".join(lines))
        got = [i for i, _ in sections]
        assert got == indexes  # document order, all unique
        assert len(set(got)) == len(got)
        bodies = dict(sections)
        for idx in got:
            assert bodies[idx].startswith(f"{idx}. Title")
            assert f"body of {idx}" in bodies[idx]
        # level-1 partition: each section's own body line appears in
        # exactly one chapter body
        chapters = [b for i, b in sections if "." not in i]
        for idx in got:
            owners = sum(f"body of {idx}\n" in c + "\n" for c in chapters)
            assert owners == 1

    check()


def test_ldo_expansion_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.sampled_from(["debian-ai", "debian-devel", "dpkg"]),
                 min_size=1, max_size=3, unique=True),
        st.integers(min_value=2020, max_value=2024),
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=0, max_value=3),
    )
    def check(names, y0, yspan, m0, mspan):
        spec = (
            ",".join(names)
            + f"/{y0}:{y0 + yspan}/{m0:02d}:{m0 + mspan:02d}"
        )
        out = D.expand_ldo_spec(spec)
        assert len(out) == len(names) * (yspan + 1) * (mspan + 1)
        assert len(set(out)) == len(out)
        for comb in out:
            n, y, m = comb.split("/")
            assert n in names and y0 <= int(y) <= y0 + yspan
            assert m0 <= int(m) <= m0 + mspan

    check()
