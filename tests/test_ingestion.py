"""F11/F12 ingestion stamps (SURVEY §2.8; reference
vector_service/app.py:199-200): uuid4 per row, epoch-seconds default
with the reference's Python-falsiness semantics (0 == missing)."""

from __future__ import annotations

import re
import time

from debgpt7_8_with_vectordb_spark.operators.ingestion import (
    UUID4_RE,
    stamp_ingestion_ids,
)


def test_uuid_per_row_unique_and_v4(spark):
    df = stamp_ingestion_ids(spark.range(200).selectExpr("id AS doc_id"))
    rows = df.collect()
    ids = [r["msg_id"] for r in rows]
    assert len(set(ids)) == 200  # per-row evaluation, not constant-folded
    pat = re.compile(UUID4_RE)
    assert all(pat.match(i) for i in ids)


def test_supplied_ts_zero_and_null_fall_back_to_now(spark):
    """Reference: ``msg.timestamp or int(time.time())`` — Python `or`
    treats BOTH None and 0 as missing. nullif(ts,0) mirrors that."""
    rows = [(1, 1700000000), (2, 0), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, supplied long")
    before = int(time.time())
    got = {
        r["doc_id"]: r["created_ts"]
        for r in stamp_ingestion_ids(df, supplied_ts="supplied").collect()
    }
    after = int(time.time())
    assert got[1] == 1700000000  # non-zero supplied wins
    for doc in (2, 3):  # falsy supplied -> arrival second
        assert before - 5 <= got[doc] <= after + 5
