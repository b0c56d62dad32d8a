"""Registry mapping query names → Spark builders (+ DuckDB oracle SQL).

Contract (driver's ``__spark_entry__``): each builder takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle string is ANSI SQL
DuckDB runs over the same parquet registered as views. Column names are
aligned on both sides (the driver sorts columns by name before hashing).
Queries without an oracle entry (non-SQL-expressible dataflow ops) get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Engine-wide data contract: documents.text is never NULL — a NULL text
# reads as the empty document. The Spark side normalizes in
# tables.load_table; this subquery applies the SAME normalization inside
# every oracle (the driver registers views over the RAW parquet, so the
# contract must live in the SQL itself). Both engines then agree on
# degenerate rows — see tests/test_edge_documents.py.
_DOCS_NORMALIZED = (
    "(SELECT doc_id, coalesce(text, '') AS text, lang, source, n_chars"
    " FROM documents)"
)


def _apply_contract(sql: str) -> str:
    return sql.replace("FROM documents", f"FROM {_DOCS_NORMALIZED}").replace(
        "JOIN documents", f"JOIN {_DOCS_NORMALIZED}"
    )


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = _apply_contract(oracle)
        return fn

    return deco
