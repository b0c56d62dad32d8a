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
