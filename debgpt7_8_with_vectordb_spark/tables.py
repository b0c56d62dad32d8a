"""Table loaders for the driver-generated testdata star schema.

All parquet timestamp columns in the testdata are ``TIMESTAMP(NANOS)``,
which Spark's vectorized parquet reader rejects; we read them as long
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to micros-precision
timestamps (flooring, matching DuckDB's nanos→micros cast).

At 100 TB these reads would be partitioned Delta/parquet tables; loading
stays a plain ``spark.read.parquet`` so Catalyst's column pruning, filter
pushdown and partition pruning all apply unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns stored as TIMESTAMP(NANOS) in the testdata parquet
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _fix_nanos(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    for c in cols:
        field = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
        if field.get(c) == "bigint":
            # nanos → micros, flooring like DuckDB's TIMESTAMP cast.
            # Integer DIV, not `/` — float division loses precision on
            # 1.7e18-scale nanos (double mantissa is 53 bits).
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _NANO_TS_COLS:
        df = _fix_nanos(df, _NANO_TS_COLS[name])
    if name == "documents" and "text" in df.columns:
        # engine contract (mirrored in every oracle via plans.catalog):
        # NULL text reads as the empty document — downstream operators
        # then have ONE degenerate case ('') instead of two ('', NULL)
        df = df.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Spread a NARROW scan across the cluster before a CPU-heavy
    per-row stage (optimization guide §2.5, input skew: "one huge
    unsplittable file … repartition immediately after the read").

    A small parquet file plans as ONE scan task, so every expensive
    per-row stage downstream (codec decode, per-shingle hashing,
    sliding-window math) runs serial while the rest of the cluster
    idles — measured 8× on doc_fingerprint and 5× on the pixel-decode
    path at sf0.1. The repartition is GATED on the current partition
    count so it is scale-adaptive, not a local[32] constant: a 100 TB
    table scan already has far more splits than defaultParallelism and
    this is a no-op; only few-split inputs are spread. Partitioning is
    a deterministic hash on ``keys`` (never round-robin on re-derived
    random values — SPARK-38388 retry-duplication class; keyless calls
    fall back to round-robin repartition, whose sort-before-repartition
    keeps retries consistent)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    if keys:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df.repartition(target)
