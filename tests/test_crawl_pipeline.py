"""End-to-end crawl curation (operators/crawl.py): WARC shards through
robots policy, URL canonical dedup, boilerplate removal, exact content
dedup and the length floor — with deterministic keep rules pinned."""

from __future__ import annotations

import gzip

import pytest

from debgpt7_8_with_vectordb_spark.operators.crawl import (
    crawl_report,
    curate_crawl,
)
from debgpt7_8_with_vectordb_spark.sources.readers import read_warc

ARTICLE = " ".join(f"Sentence {i} of the long article body text." for i in range(10))
OTHER = " ".join(f"Completely different line {i} for the second page." for i in range(10))
PRIVATE = " ".join(f"Private notes paragraph {i} kept behind robots." for i in range(10))


def _page(body_text: str) -> bytes:
    return (
        "<html><body><nav><a href='/'>Home</a><a href='/n'>News</a></nav>"
        f"<main><p>{body_text}</p></main>"
        "<footer>(c) corp <a href='/t'>Terms</a></footer></body></html>"
    ).encode()


def _warc_response(uri: str, date: str, doc: bytes, status: int = 200) -> bytes:
    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n"
    ).encode() + doc
    head = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\nWARC-Date: {date}\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    )
    return head.encode() + http + b"\r\n\r\n"


@pytest.fixture(scope="module")
def spark():
    from debgpt7_8_with_vectordb_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


@pytest.fixture(scope="module")
def warc_df(spark, tmp_path_factory):
    shard = b"".join(
        [
            # same page, two URL spellings: canonical dedup collapses,
            # keeping the EARLIER fetch
            _warc_response(
                "HTTP://A.org:80/story/../news/1", "2024-01-01T00:00:00Z",
                _page(ARTICLE),
            ),
            _warc_response(
                "http://a.org/news/1?utm=x", "2024-01-02T00:00:00Z",
                _page(ARTICLE),
            ),
            # mirror of the same content on another host: content dedup
            _warc_response(
                "http://mirror.org/copy", "2024-01-03T00:00:00Z",
                _page(ARTICLE),
            ),
            # robots-disallowed page (distinct content: content dedup
            # must not be what removes it)
            _warc_response(
                "http://a.org/private/x", "2024-01-01T00:00:00Z",
                _page(PRIVATE),
            ),
            # different page that survives
            _warc_response(
                "http://b.org/page", "2024-01-04T00:00:00Z", _page(OTHER)
            ),
            # 404 and chrome-only pages drop
            _warc_response(
                "http://a.org/gone", "2024-01-01T00:00:00Z",
                _page(ARTICLE), status=404,
            ),
            _warc_response(
                "http://a.org/menu", "2024-01-01T00:00:00Z",
                b"<nav><a href='/'>only links</a></nav>",
            ),
        ]
    )
    root = tmp_path_factory.mktemp("warc")
    (root / "shard-00000.warc.gz").write_bytes(gzip.compress(shard))
    return read_warc(spark, str(root / "shard-00000.warc.gz"))


def test_curate_crawl_end_to_end(spark, warc_df):
    robots = spark.createDataFrame(
        [("a.org", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    out = curate_crawl(warc_df, robots).collect()
    by_url = {r["url"]: r for r in out}
    # exactly two documents survive: the article (once) and the b.org page
    assert len(out) == 2
    # canonical URL won over both the spelling variant and the mirror;
    # note the two a.org spellings normalize differently (?utm=x kept),
    # so CONTENT dedup does the collapse — lexicographic keep rule
    art = [r for r in out if "Sentence 0" in r["text"]]
    assert len(art) == 1
    assert art[0]["url"] == "http://a.org/news/1"
    assert art[0]["domain"] == "a.org"
    assert "Home" not in art[0]["text"]  # boilerplate stripped
    assert "http://b.org/page" in by_url
    # monitor columns present and sane
    assert 0.0 < art[0]["boilerplate_ratio"] < 1.0


def test_curate_without_robots_keeps_private(spark, warc_df):
    out = curate_crawl(warc_df).collect()
    urls = {r["url"] for r in out}
    assert "http://a.org/private/x" in urls
    assert len(out) == 3  # private page now survives alongside the two


def test_crawl_report(spark, warc_df):
    curated = curate_crawl(warc_df)
    rep = {r["domain"]: r for r in crawl_report(curated).collect()}
    assert rep["a.org"]["n_docs"] >= 1
    assert rep["b.org"]["text_chars"] > 0


def test_plan_shape(spark, warc_df):
    plan = curate_crawl(warc_df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --------------------------------------------- documents bridge + sitemaps


def test_crawl_to_documents_bridge(spark, warc_df):
    from debgpt7_8_with_vectordb_spark.operators.crawl import (
        crawl_to_documents,
    )

    curated = curate_crawl(warc_df)
    docs = crawl_to_documents(curated)
    assert [f.simpleString() for f in docs.schema.fields] == [
        "doc_id:bigint", "source:string", "lang:string",
        "ts:timestamp", "text:string",
    ]
    rows = docs.collect()
    assert len(rows) == curated.count()
    ids = [r["doc_id"] for r in rows]
    assert len(set(ids)) == len(ids) and all(i > 0 for i in ids)
    # deterministic: same input -> same ids
    assert sorted(ids) == sorted(r["doc_id"] for r in crawl_to_documents(
        curate_crawl(warc_df)).collect())
    # existing corpus machinery applies directly: exact-dedup digest
    import pyspark.sql.functions as F
    assert docs.groupBy(F.md5("text")).count().count() == len(rows)


SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.org/p1</loc><lastmod>2024-01-01</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>http://a.org/p2</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.org/sitemap-1.xml</loc>
           <lastmod>2024-02-02</lastmod></sitemap>
  <sitemap><loc>http://a.org/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_and_index():
    from debgpt7_8_with_vectordb_spark.operators.crawl import parse_sitemap

    urls = parse_sitemap(SITEMAP)
    assert [u["loc"] for u in urls] == ["http://a.org/p1", "http://a.org/p2"]
    assert urls[0]["changefreq"] == "daily" and urls[0]["priority"] == "0.8"
    assert urls[1]["lastmod"] is None
    idx = parse_sitemap(SITEMAP_INDEX)
    assert [e["kind"] for e in idx] == ["sitemap", "sitemap"]
    assert idx[0]["lastmod"] == "2024-02-02"
    assert parse_sitemap("not xml at all") == []
    # truncation keeps complete entries
    assert len(parse_sitemap(SITEMAP[: SITEMAP.index("p2")])) == 1


def test_expand_sitemaps_stage(spark):
    from debgpt7_8_with_vectordb_spark.operators.crawl import expand_sitemaps

    df = spark.createDataFrame(
        [("a.org", SITEMAP), ("b.org", SITEMAP_INDEX), ("c.org", None)],
        "host string, sitemap_xml string",
    )
    rows = expand_sitemaps(df).collect()
    assert len(rows) == 4
    kinds = {(r["host"], r["kind"]) for r in rows}
    assert ("a.org", "url") in kinds and ("b.org", "sitemap") in kinds


def test_quality_gated_curation(spark, warc_df):
    # the synthetic pages are short prose with stopwords; with quality
    # gates on, pages must pass C4 line rules AND the Gopher page gates
    loose = curate_crawl(warc_df)
    strict = curate_crawl(warc_df, quality=True)
    n_loose, n_strict = loose.count(), strict.count()
    assert n_strict <= n_loose
    # schema is unchanged by the quality path
    assert strict.columns == loose.columns
    plan = strict._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
