"""Per-document repetition profiling — Gopher-style quality signals.

Repetition filters (duplicate-token fraction, most-common token /
bigram occurrence fractions) are per-document mode statistics: the
modal count of a multiset has no Catalyst builtin, and an
``F.aggregate`` struct-accumulator fold over the sorted token array is
interpreted per element (the doc_fingerprint lesson — HOF folds lose
~8× to alternatives, NOTES.md). So the counts come out of ONE
Arrow-batched mapInPandas pass with ``collections.Counter`` — zero
shuffle, linear in corpus bytes, and strictly cheaper than the
explode → groupBy(doc, token) → groupBy(doc) two-shuffle plan that the
same stats would need in pure DataFrame ops.

Only INTEGER counts cross the Python boundary; every ratio (and its
round(6)) is computed JVM-side so Spark and the DuckDB oracle share
bit-identical IEEE division + HALF_UP rounding (Python's banker's
rounding diverges on exact-tie fractions like 1/128).

Tokenization contract: ``str.split()`` ≡ Spark ``split(text, '\\s+')``
with empties dropped ≡ DuckDB ``string_split_regex`` + filter — all
three drop empty tokens and treat whitespace runs as one separator.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "doc_id long, n_tokens long, n_distinct long, "
    "top_token_count long, top_bigram_count long"
)


def repetition_counts(docs: DataFrame) -> DataFrame:
    """Integer repetition counts per document.

    Input needs ``doc_id`` and ``text``; output is one row per input row
    with token/distinct counts and the modal token and adjacent-bigram
    occurrence counts (0 for documents too short to have any).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = (text or "").split()
                wc = Counter(toks)
                bc = Counter(zip(toks, toks[1:]))
                rows.append(
                    (
                        doc_id,
                        len(toks),
                        len(wc),
                        max(wc.values(), default=0),
                        max(bc.values(), default=0),
                    )
                )
            cols = [
                "doc_id",
                "n_tokens",
                "n_distinct",
                "top_token_count",
                "top_bigram_count",
            ]
            # astype: an empty batch builds object columns, which Arrow
            # won't coerce to the declared long schema
            yield pd.DataFrame(rows, columns=cols).astype("int64")

    return docs.select("doc_id", "text").mapInPandas(run, schema=_OUT_SCHEMA)
