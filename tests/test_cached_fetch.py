"""O6 read-through cache: the second run must fetch NOTHING.

The reference memoizes expensive sources with ``@enable_cache``
(reader.py:157-175); the engine's equivalent is a dataflow split
(sources/fanout.py fetch_urls_cached). These tests drive the operator
with a transport that counts its calls through a Spark accumulator and
assert the read-through contract: first run fetches exactly the misses,
second run fetches zero; bodies survive the cache round-trip verbatim.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from debgpt7_8_with_vectordb_spark.operators.kvcache import KVCache
from debgpt7_8_with_vectordb_spark.sources.fanout import fetch_urls_cached


def _body(url: str) -> str:
    return "body|" + hashlib.md5(url.encode()).hexdigest()


def test_second_run_fetches_zero(spark, tmp_path):
    cache = KVCache(spark, str(tmp_path / "kv"))
    urls = spark.range(20).select(
        F.concat(F.lit("u://"), F.col("id").cast("string")).alias("url")
    )
    calls = spark.sparkContext.accumulator(0)

    def fetcher(url):
        import hashlib

        calls.add(1)
        return 200, "body|" + hashlib.md5(url.encode()).hexdigest()

    first = fetch_urls_cached(urls, cache, fetcher).collect()
    assert len(first) == 20
    assert all(r["served_from"] == "fetch" for r in first)
    assert calls.value == 20

    second = fetch_urls_cached(urls, cache, fetcher).collect()
    assert len(second) == 20
    assert all(r["served_from"] == "cache" for r in second)
    assert calls.value == 20  # not a single new transport call
    # bodies identical across the cache round-trip
    assert {r["url"]: r["content"] for r in second} == {
        r["url"]: r["content"] for r in first
    }


def test_partial_seed_fetches_only_misses(spark, tmp_path):
    cache = KVCache(spark, str(tmp_path / "kv"))
    urls = spark.range(10).select(
        F.concat(F.lit("u://"), F.col("id").cast("string")).alias("url")
    )
    cache.put_many(
        urls.filter(F.expr("substr(url, 5) % 2 = 0")).select(
            F.col("url").alias("key"), F.concat(F.lit("seed|"), "url").alias("value")
        )
    )
    calls = spark.sparkContext.accumulator(0)

    def fetcher(url):
        import hashlib

        calls.add(1)
        return 200, "body|" + hashlib.md5(url.encode()).hexdigest()

    out = {r["url"]: r for r in fetch_urls_cached(urls, cache, fetcher).collect()}
    assert calls.value == 5
    for i in range(10):
        r = out[f"u://{i}"]
        if i % 2 == 0:
            assert r["served_from"] == "cache" and r["content"] == f"seed|u://{i}"
        else:
            assert r["served_from"] == "fetch" and r["content"] == _body(f"u://{i}")


def test_failed_fetch_not_cached(spark, tmp_path):
    cache = KVCache(spark, str(tmp_path / "kv"))
    urls = spark.range(4).select(
        F.concat(F.lit("u://"), F.col("id").cast("string")).alias("url")
    )

    def flaky(url):
        import hashlib

        if url.endswith("3"):
            return 503, ""
        return 200, "body|" + hashlib.md5(url.encode()).hexdigest()

    out = fetch_urls_cached(urls, cache, flaky, max_attempts=1).collect()
    assert {r["url"]: r["status"] for r in out} == {
        "u://0": 200, "u://1": 200, "u://2": 200, "u://3": 503,
    }
    # the failure must NOT be memoized — a later run retries it
    assert cache.get("u://3") is None
    assert len(cache) == 3


def test_result_survives_snapshot_pruning(spark, tmp_path):
    """The returned frame must stay consumable after keep_snapshots
    further commits prune the snapshot it was planned against (round-3
    advice: the hits side used to hold a lazy scan of the pre-upsert
    snapshot directory and fail once _commit deleted it)."""
    cache = KVCache(spark, str(tmp_path / "kv"), keep_snapshots=2)
    urls = spark.range(6).select(
        F.concat(F.lit("u://"), F.col("id").cast("string")).alias("url")
    )

    def fetcher(url):
        import hashlib

        return 200, "body|" + hashlib.md5(url.encode()).hexdigest()

    fetch_urls_cached(urls, cache, fetcher)  # seed the cache
    late = fetch_urls_cached(urls, cache, fetcher)  # all-hits result
    # churn the cache far past keep_snapshots before consuming `late`
    for i in range(4):
        cache.put_many(
            spark.range(1).select(
                F.lit(f"churn://{i}").alias("key"), F.lit("x").alias("value")
            )
        )
    rows = late.collect()
    assert len(rows) == 6
    assert all(r["served_from"] == "cache" for r in rows)
    assert {r["content"] for r in rows} == {_body(f"u://{i}") for i in range(6)}
