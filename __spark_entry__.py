"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``debgpt7_8_with_vectordb_spark.plans``;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (top-k cosine retrieval with provenance resolution —
    the reference's core capability) on /root/testdata/sf0.001."""
    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    return QUERIES["topk_retrieval"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from debgpt7_8_with_vectordb_spark.plans import ORACLE

    return dict(ORACLE)
