"""S15 recursive pagination (sources/fanout.py fetch_paginated):
frontier mechanics the oracle's straight-chain walk can't exercise —
cycles, converging links, the round bound, and failure pages.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from debgpt7_8_with_vectordb_spark.sources.fanout import fetch_paginated


def _seeds(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_three_page_walk_exact_union(spark):
    def fetcher(url):
        graph = {"p://a": "p://b", "p://b": "p://c", "p://c": None}
        return 200, "body-" + url[-1], graph[url]

    out = fetch_paginated(_seeds(spark, ["p://a"]), fetcher).collect()
    got = {(r["url"], r["depth"], r["content"]) for r in out}
    assert got == {
        ("p://a", 0, "body-a"),
        ("p://b", 1, "body-b"),
        ("p://c", 2, "body-c"),
    }


def test_cycle_terminates_and_dedupes(spark):
    def fetcher(url):
        nxt = {"p://a": "p://b", "p://b": "p://a"}[url]
        return 200, "x", nxt

    out = fetch_paginated(_seeds(spark, ["p://a"]), fetcher, max_pages=10).collect()
    # the back-link to the visited page is never re-fetched
    assert sorted((r["url"], r["depth"]) for r in out) == [("p://a", 0), ("p://b", 1)]


def test_converging_chains_fetch_once(spark):
    # two seeds link into the same tail page: one fetch, first depth wins
    def fetcher(url):
        nxt = {"p://a": "p://t", "p://b": "p://t", "p://t": None}[url]
        return 200, "x", nxt

    out = fetch_paginated(_seeds(spark, ["p://a", "p://b"]), fetcher).collect()
    tails = [r for r in out if r["url"] == "p://t"]
    assert len(tails) == 1 and tails[0]["depth"] == 1
    assert len(out) == 3


def test_max_pages_bounds_the_walk(spark):
    def fetcher(url):
        n = int(url.rsplit("/", 1)[1])
        return 200, "x", f"p:/{n + 1}"  # infinite chain

    out = fetch_paginated(_seeds(spark, ["p:/0"]), fetcher, max_pages=5).collect()
    assert len(out) == 5
    assert {r["depth"] for r in out} == set(range(5))


def test_failed_page_stops_its_chain(spark):
    def fetcher(url):
        if url == "p://b":
            raise RuntimeError("boom")
        return 200, "x", {"p://a": "p://b"}.get(url)

    out = {r["url"]: r for r in fetch_paginated(_seeds(spark, ["p://a"]), fetcher).collect()}
    assert out["p://a"]["status"] == 200
    assert out["p://b"]["status"] == 598 and out["p://b"]["content"] == ""
    assert len(out) == 2
