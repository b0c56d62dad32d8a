"""S7/T2 KV cache: dict protocol, upsert, TTL sweep (reference cache.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from debgpt7_8_with_vectordb_spark.operators.kvcache import KVCache


def test_put_get_contains_len(spark, tmp_path):
    c = KVCache(spark, str(tmp_path / "cache"))
    assert len(c) == 0
    assert c.get("a") is None

    c.put("a", "1")
    c.put("b", "2")
    assert len(c) == 2
    assert c.get("a") == "1"
    assert "b" in c and "z" not in c
    assert sorted(c.keys()) == ["a", "b"]


def test_upsert_replaces(spark, tmp_path):
    c = KVCache(spark, str(tmp_path / "cache"))
    c.put("k", "old")
    c.put("k", "new")  # INSERT OR REPLACE semantics (cache.py:78-80)
    assert len(c) == 1
    assert c.get("k") == "new"


def test_batch_upsert_and_delete(spark, tmp_path):
    c = KVCache(spark, str(tmp_path / "cache"))
    c.put_many(
        spark.createDataFrame(
            [(f"k{i}", str(i)) for i in range(20)], "key string, value string"
        )
    )
    assert len(c) == 20
    c.put_many(
        spark.createDataFrame(
            [("k3", "updated"), ("k99", "fresh")], "key string, value string"
        )
    )
    assert len(c) == 21
    assert c.get("k3") == "updated" and c.get("k99") == "fresh"
    c.delete(["k0", "k1", "k99"])
    assert len(c) == 18
    assert c.get("k0") is None


def test_ttl_expire(spark, tmp_path):
    c = KVCache(spark, str(tmp_path / "cache"), ttl="INTERVAL 1 MONTH")
    c.put("fresh", "v")
    # plant an already-expired row by committing a backdated snapshot
    old = spark.createDataFrame([("stale", "v")], "key string, value string").select(
        "key",
        "value",
        (F.current_timestamp() - F.expr("INTERVAL 2 MONTH")).alias("stamp"),
    )
    c._commit(c.df().unionByName(old))
    assert len(c) == 2
    assert c.expire() == 1  # stale dropped (cache.py:45-51)
    assert c.get("fresh") == "v" and c.get("stale") is None


def test_snapshot_isolation(spark, tmp_path):
    c = KVCache(spark, str(tmp_path / "cache"))
    c.put("k", "v1")
    reader = c.df()  # binds to snapshot v0's files
    c.put("k", "v2")  # writes v1, flips _latest
    assert c.get("k") == "v2"
    # the pre-mutation reader still resolves (old snapshot dir intact)
    assert reader.count() == 1
