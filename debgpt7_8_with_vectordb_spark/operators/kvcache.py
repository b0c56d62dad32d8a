"""TTL'd key-value cache table (reference T2 `cache`, cache.py:29-287).

The reference exposes the full Python dict protocol over a SQLite table
(key TEXT PRIMARY KEY, value BLOB lz4, stamp TIMESTAMP) with a 1-month
TTL swept at open (cache.py:45-64). Spark shape: a keyed parquet table
``key STRING, value STRING, stamp TIMESTAMP``; lz4-at-rest is subsumed
by parquet page compression (SURVEY §1.4).

Batch semantics replace row-at-a-time ones deliberately:

- ``put_many`` is an upsert batch (union + keep-latest-per-key), NOT the
  reference's commit-per-row INSERT OR REPLACE (an anti-pattern recorded
  in SURVEY §4.1) — one shuffle on key per batch;
- ``expire`` is the P4 TTL sweep as an anti-filter rewrite;
- point ``get`` is a pushdown filter; ``items``/``__len__``-style reads
  are scans (S7).

Versioned directories stand in for a transactional table format: each
mutation writes a NEW snapshot dir and ``_latest`` flips atomically via
rename — the parquet-only analogue of a Delta/Iceberg commit (readers of
the old snapshot stay consistent; no read-modify-write in place).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

CACHE_SCHEMA = "key string, value string, stamp timestamp"


class KVCache:
    """Dict-protocol-shaped batch KV cache over versioned parquet."""

    def __init__(self, spark: SparkSession, root: str, ttl: str = "INTERVAL 1 MONTH"):
        self.spark = spark
        self.root = root
        self.ttl = ttl
        os.makedirs(root, exist_ok=True)

    # -- snapshot plumbing -------------------------------------------------
    def _latest_path(self) -> str | None:
        marker = os.path.join(self.root, "_latest")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return os.path.join(self.root, f.read().strip())

    def _commit(self, df: DataFrame) -> None:
        versions = sorted(
            int(d[1:]) for d in os.listdir(self.root) if d.startswith("v") and d[1:].isdigit()
        )
        nxt = f"v{(versions[-1] + 1) if versions else 0}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, nxt))
        tmp = os.path.join(self.root, "_latest.tmp")
        with open(tmp, "w") as f:
            f.write(nxt)
        os.replace(tmp, os.path.join(self.root, "_latest"))  # atomic flip

    # -- reads -------------------------------------------------------------
    def df(self) -> DataFrame:
        path = self._latest_path()
        if path is None:
            return self.spark.createDataFrame([], CACHE_SCHEMA)
        return self.spark.read.schema(CACHE_SCHEMA).parquet(path)

    def get(self, key: str) -> str | None:
        """S7 point get — pushdown equality filter (P3)."""
        row = self.df().filter(F.col("key") == key).select("value").head()
        return None if row is None else row[0]

    def __contains__(self, key: str) -> bool:
        return self.df().filter(F.col("key") == key).limit(1).count() > 0

    def __len__(self) -> int:
        """A1 COUNT(*) (reference cache.py:150-151)."""
        return self.df().count()

    def keys(self) -> list[str]:
        return [r[0] for r in self.df().select("key").collect()]

    # -- writes ------------------------------------------------------------
    def put_many(self, kv: DataFrame) -> None:
        """Upsert batch (INSERT OR REPLACE semantics, cache.py:78-80):
        new rows win over existing rows with the same key."""
        stamped = kv.select(
            "key", "value", F.current_timestamp().alias("stamp"), F.lit(0).alias("pri")
        )
        existing = self.df().withColumn("pri", F.lit(1))
        w = Window.partitionBy("key").orderBy("pri", F.desc("stamp"))
        merged = (
            existing.unionByName(stamped)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("key", "value", "stamp")
        )
        self._commit(merged)

    def put(self, key: str, value: str) -> None:
        self.put_many(
            self.spark.createDataFrame([(key, value)], "key string, value string")
        )

    def delete(self, keys: list[str]) -> None:
        """del semantics — anti-filter (isin → anti-join for large sets)."""
        self._commit(self.df().filter(~F.col("key").isin(keys)))

    def expire(self) -> int:
        """P4 TTL sweep (cache.py:45-51): drop rows older than ttl;
        returns surviving count."""
        kept = self.df().filter(
            F.col("stamp") >= F.current_timestamp() - F.expr(self.ttl)
        )
        self._commit(kept)
        return len(self)
