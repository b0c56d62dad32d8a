"""Recursive-bisection document chunker (reference C1/C2).

Semantics (reference reader.py:1035-1115 `chunk_lines`): split a
document's line list by binary bisection on the line axis until each
span's UTF-8 byte size (lines joined by '\\n') is ≤ ``max_bytes``; a
single over-long line becomes its own chunk (termination guard). Chunk
key is (doc, start, end) with 0-based [start, end) line spans
(reference reader.py:178-191 entry2dict).

Spark shape: the chunker is a pure function of ONE document, so the
operator is embarrassingly parallel — ``mapInPandas`` over the documents
table, Arrow-batched, emitting one row per chunk. No shuffle; at 100 TB
parallelism is simply the number of input splits.

Implementation is from scratch (iterative, stack-based — the reference's
recursive version can hit RecursionError, its own fallback at
reader.py:184-187 concedes as much).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CHUNK_SCHEMA = "doc_id long, start int, end int, n_bytes long, content string"


def _span_bytes(lines: list[str], s: int, e: int) -> int:
    """UTF-8 byte size of lines[s:e] joined by '\\n' (reference sizes
    chunks in octets incl. the joiners — reader.py:1061, mapreduce.py:73)."""
    if e <= s:
        return 0
    total = e - s - 1  # the '\n' joiners
    for i in range(s, e):
        total += len(lines[i].encode("utf-8"))
    return total


def chunk_spans(lines: list[str], max_bytes: int) -> list[tuple[int, int]]:
    """Bisect [0, n) until every span fits in ``max_bytes``; 1-line spans
    always terminate. Returns spans in document order."""
    n = len(lines)
    if n == 0:
        return []
    out: list[tuple[int, int]] = []
    stack: list[tuple[int, int]] = [(0, n)]
    while stack:
        s, e = stack.pop()
        if e - s <= 1 or _span_bytes(lines, s, e) <= max_bytes:
            out.append((s, e))
        else:
            mid = s + (e - s) // 2
            # push right first so pops come out left-to-right
            stack.append((mid, e))
            stack.append((s, mid))
    out.sort()
    return out


def chunk_text(text: str, max_bytes: int, sep: str = "\n") -> list[tuple[int, int, int, str]]:
    """Chunk one document; returns (start, end, n_bytes, content) rows."""
    lines = text.split(sep)
    rows = []
    for s, e in chunk_spans(lines, max_bytes):
        content = "\n".join(lines[s:e])
        rows.append((s, e, len(content.encode("utf-8")), content))
    return rows


def chunk_documents(
    docs: DataFrame,
    max_bytes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    include_content: bool = True,
) -> DataFrame:
    """documents → chunks table via Arrow-batched mapInPandas."""
    cols = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for s, e, nb, content in chunk_text(text or "", max_bytes, sep):
                    recs.append((doc_id, s, e, nb, content if include_content else ""))
            yield pd.DataFrame(
                recs, columns=["doc_id", "start", "end", "n_bytes", "content"]
            )

    out = cols.mapInPandas(emit, schema=CHUNK_SCHEMA)
    return out if include_content else out.drop("content")
