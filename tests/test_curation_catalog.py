"""Round-8 curation catalog entries (VERDICT r7 #1): semantics pins for
gopher_signals / c4_line_clean / url_normalize / curate_crawl beyond the
DuckDB-oracle hash (tools/check_oracle.py covers cross-engine equality;
these assert the operator-level invariants a hash can't explain)."""

from __future__ import annotations

from debgpt7_8_with_vectordb_spark.plans import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"


def test_gopher_signals_decoration_classes(spark):
    rows = QUERIES["gopher_signals"](spark, SF).collect()
    by_class = lambda k: [r for r in rows if r["doc_id"] % 5 == k]  # noqa: E731
    assert all(r["hash_ratio"] > 0 for r in by_class(1))
    assert all(r["hash_ratio"] == 0 for r in by_class(0))
    assert all(r["bullet_line_frac"] > 0 for r in by_class(2))
    assert all(r["ellipsis_line_frac"] > 0 for r in by_class(3))
    assert all(r["ellipsis_ratio"] > 0 for r in by_class(4))
    # class-1 decoration injects non-alpha words -> alpha fraction dips
    assert all(r["alpha_word_frac"] < 1.0 for r in by_class(1))
    verdicts = {r["passes"] for r in rows}
    assert verdicts == {True, False}  # the gate set is discriminative


def test_gopher_filter_matches_signals_verdict(spark):
    """The catalog query's `passes` column IS gopher_quality_filter's
    keep set (same conjunction, same thresholds)."""
    import pyspark.sql.functions as F

    from debgpt7_8_with_vectordb_spark.operators.quality_rules import (
        gopher_quality_filter,
    )
    from debgpt7_8_with_vectordb_spark.plans.curation_queries import (
        _GOPHER_DECOR_SPARK,
    )
    from debgpt7_8_with_vectordb_spark.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.expr(_GOPHER_DECOR_SPARK).alias("text")
    )
    kept = {
        r["doc_id"] for r in gopher_quality_filter(docs).select("doc_id").collect()
    }
    passed = {
        r["doc_id"]
        for r in QUERIES["gopher_signals"](spark, SF).collect()
        if r["passes"]
    }
    assert kept == passed and kept


def test_c4_line_clean_rules(spark):
    rows = QUERIES["c4_line_clean"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["lines_total"] >= r["lines_dropped"] >= 0
        for line in filter(None, r["text"].split("\n")):
            assert line.rstrip().endswith(".")  # only the '.'-suffixed survive
            assert "javascript" not in line
            assert len(line.split()) >= 3
    assert any(r["lines_dropped"] > 0 for r in rows)
    assert any(r["text"] for r in rows)


def test_url_normalize_exact_forms(spark):
    rows = {r["doc_id"]: r for r in QUERIES["url_normalize"](spark, SF).collect()}
    r0 = rows[0]  # class 0: case + default port + fragment
    assert r0["url_norm"] == "http://example0.com/a/b/file0.html"
    assert r0["domain"] == "example0.com"
    r1 = rows[1]  # class 1: dot segments + query sort
    assert r1["url_norm"] == "https://example1.com/x/z1?a=1&b=2"
    r2 = rows[2]  # class 2: unreserved pct-decode, other pct uppercased
    assert r2["url_norm"] == "http://example2.com/~user%2FdAta2"
    r3 = rows[3]  # class 3: empty path + trailing-dot host
    assert r3["url_norm"] == "http://example3.com/"
    r4 = rows[4]  # class 4: ftp default port + co.uk registrable domain
    assert r4["url_norm"] == "ftp://sub.host4.co.uk/pub/4"
    assert r4["domain"] == "host4.co.uk"
    r5 = rows[5]  # class 5: non-crawl scheme
    assert r5["url_norm"] is None and r5["domain"] is None


def test_curate_crawl_funnel_invariants(spark):
    rows = QUERIES["curate_crawl"](spark, SF).collect()
    assert rows
    urls = [r["url"] for r in rows]
    assert len(set(urls)) == len(urls)  # canonical-URL dedup held
    digests = [r["digest"] for r in rows]
    assert len(set(digests)) == len(digests)  # content dedup held
    for r in rows:
        assert r["url"] == r["url"].lower()  # canonical spelling won
        assert r["n_chars"] >= 100  # length floor
        assert r["domain"] == "example.org"
        assert r["blocks_kept"] == 1 and r["blocks_total"] == 3
        host = r["url"].split("//")[1].split(".")[0]
        if "/private/" in r["url"]:  # robots gate: policed hosts clean
            assert int(host[1:]) % 2 == 1
        # first-fetch keep rule: the earlier (even-doc) spelling won
        assert r["fetched_at"].endswith("00Z")


def test_sitemap_expand_kinds_and_fields(spark):
    rows = QUERIES["sitemap_expand"](spark, SF).collect()
    assert rows
    by_kind = {"url": [], "sitemap": []}
    for r in rows:
        by_kind[r["kind"]].append(r)
    assert by_kind["url"] and by_kind["sitemap"]
    # index children never carry page-level tags
    assert all(r["changefreq"] is None and r["priority"] is None
               for r in by_kind["sitemap"])
    # fully-tagged urlset entries exist alongside loc-only ones
    assert any(r["changefreq"] == "daily" for r in by_kind["url"])
    assert any(r["lastmod"] is None for r in by_kind["url"])
    # discovery volume: two rows per source sitemap document
    assert len(rows) == 2 * 500


def test_stream_curate_matches_batch_twin(spark):
    """Ingest-time curation computes the same funnel as the batch
    operator: identical row sets (the shared oracle proves it against
    DuckDB; this pins Spark-vs-Spark equality directly, incl. the
    update-mode min_by state and the batch epilogue re-reduce)."""
    batch = {tuple(r) for r in QUERIES["curate_crawl"](spark, SF).collect()}
    stream = {tuple(r) for r in QUERIES["stream_curate"](spark, SF).collect()}
    assert batch == stream and batch


def test_new_curation_queries_are_oracled():
    for name in ("gopher_signals", "c4_line_clean", "url_normalize",
                 "curate_crawl", "sitemap_expand", "stream_curate"):
        assert name in QUERIES and name in ORACLE
