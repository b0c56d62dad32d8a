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


def test_strict_getitem_delitem(spark, tmp_path):
    """Reference cache.py:83-119 raises KeyError on missing keys."""
    import pytest

    c = KVCache(spark, str(tmp_path / "cache"))
    c.put("a", "1")
    assert c["a"] == "1"
    with pytest.raises(KeyError):
        c["missing"]
    del c["a"]
    assert "a" not in c
    with pytest.raises(KeyError):
        del c["a"]


def test_pop_and_popitem(spark, tmp_path):
    """Reference cache.py:231-267: pop returns value-or-default and
    removes; popitem is the K6 LIMIT-1 shape on a nonempty cache."""
    import pytest

    c = KVCache(spark, str(tmp_path / "cache"))
    c.put_many(
        spark.createDataFrame(
            [("a", "1"), ("b", "2"), ("c", "3")], "key string, value string"
        )
    )
    assert c.pop("b") == "2"
    assert c.pop("b", "dflt") == "dflt"
    assert len(c) == 2
    # deterministic choice: lowest key first
    assert c.popitem() == ("a", "1")
    assert c.popitem() == ("c", "3")
    with pytest.raises(KeyError):
        c.popitem()


def test_setdefault_update_clear_items(spark, tmp_path):
    """Reference cache.py:178-293: items/setdefault/update/clear."""
    c = KVCache(spark, str(tmp_path / "cache"))
    assert c.setdefault("k", "v0") == "v0"  # absent -> inserted
    assert c.setdefault("k", "OTHER") == "v0"  # present -> existing wins
    c.update({"x": "1", "y": "2"})
    c.update(
        spark.createDataFrame([("y", "22"), ("z", "3")], "key string, value string")
    )
    assert sorted(c.items()) == [("k", "v0"), ("x", "1"), ("y", "22"), ("z", "3")]
    assert sorted(c) == ["k", "x", "y", "z"]  # __iter__ yields keys
    assert sorted(c.values()) == ["1", "22", "3", "v0"]
    assert len(c.keys(limit=2)) == 2  # bounded driver collect
    c.clear()
    assert len(c) == 0


def test_update_from_other_cache(spark, tmp_path):
    src = KVCache(spark, str(tmp_path / "src"))
    src.update({"a": "1", "b": "2"})
    dst = KVCache(spark, str(tmp_path / "dst"))
    dst.put("b", "old")
    dst.update(src)  # other-cache keys overwrite (dict.update semantics)
    assert sorted(dst.items()) == [("a", "1"), ("b", "2")]


def test_commit_lock_and_retention(spark, tmp_path):
    """Single-writer lock fails fast; retention keeps only the last
    keep_snapshots dirs while the live reader of the newest survives."""
    import os

    import pytest

    root = str(tmp_path / "cache")
    c = KVCache(spark, root, keep_snapshots=2)
    for i in range(5):
        c.put(f"k{i}", str(i))
    vdirs = sorted(d for d in os.listdir(root) if d.startswith("v"))
    assert vdirs == ["v3", "v4"]
    assert len(c) == 5  # latest snapshot intact after pruning

    # a LIVE writer holds the flock -> second writer fails fast
    import fcntl

    lock = os.path.join(root, "_commit.lock")
    fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    with pytest.raises(RuntimeError, match="single-writer"):
        c.put("contended", "x")
    fcntl.flock(fd, fcntl.LOCK_UN)
    os.close(fd)
    c.put("contended", "x")  # lock released -> commits again
    assert c.get("contended") == "x"


def test_killed_writer_leaves_no_stale_lock(spark, tmp_path):
    """A writer killed mid-commit must not block the next writer: the
    kernel drops its flock with the process, so a leftover
    _commit.lock FILE alone (the old O_EXCL scheme's permanent wedge —
    VERDICT r4 #6) means nothing."""
    import os
    import signal
    import subprocess
    import sys
    import time

    root = str(tmp_path / "cache")
    c = KVCache(spark, root)
    c.put("k", "v")

    # child acquires the flock exactly like _commit, then hangs as if
    # crashed between acquisition and release
    child = subprocess.Popen(
        [
            sys.executable,
            "-c",
            f"""
import fcntl, os, time
fd = os.open({os.path.join(root, "_commit.lock")!r}, os.O_CREAT | os.O_WRONLY)
fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
print("locked", flush=True)
time.sleep(300)
""",
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    assert child.stdout.readline().strip() == "locked"
    import pytest

    with pytest.raises(RuntimeError, match="live writer"):
        c.put("blocked", "x")  # the child really holds it

    child.send_signal(signal.SIGKILL)  # crash mid-commit
    child.wait()
    time.sleep(0.1)
    assert os.path.exists(os.path.join(root, "_commit.lock"))  # file stays
    c.put("recovered", "yes")  # ...but the next writer just acquires
    assert c.get("recovered") == "yes"
