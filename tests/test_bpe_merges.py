"""Planted-corpus contract for bpe_train_merges: hand-computed merge
sequence, tie-break, non-overlap fold, and early exhaustion."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from debgpt7_8_with_vectordb_spark.plans import QUERIES


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe")
    # vocab {aaab: 2, ab: 1} — merges are hand-computable:
    # r1: (a,a) total 4 beats (a,b) 3      -> aaab = [aa, a, b]
    # r2: (a,b) 3 beats (aa,a) 2           -> aaab = [aa, ab], ab = [ab]
    # r3: (aa,ab) 2                        -> aaab = [aaab]
    # r4: no pairs remain -> training exhausts early (3 rows, not 4)
    texts = ["aaab aaab ab"]
    tbl = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"]),
            "source": pa.array(["s"]),
            "n_chars": pa.array([len(texts[0])], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_planted_merge_sequence(spark, bpe_dir):
    rows = sorted(
        QUERIES["bpe_train_merges"](spark, bpe_dir).collect(),
        key=lambda r: r["merge_rank"],
    )
    got = [(r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"]) for r in rows]
    assert got == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 2),
    ]


def test_overlap_counts_vs_nonoverlap_merge(spark, tmp_path):
    """'aaaa' x1: r1 counts (a,a) at every adjacent position (3), but the
    merge is non-overlapping left-to-right -> [aa, aa]; r2 merges (aa,aa)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": pa.array(["aaaa"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s"]),
            "n_chars": pa.array([4], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = sorted(
        QUERIES["bpe_train_merges"](spark, str(tmp_path)).collect(),
        key=lambda r: r["merge_rank"],
    )
    got = [(r["lhs"], r["rhs"], r["pair_count"]) for r in rows]
    assert got == [("a", "a", 3), ("aa", "aa", 1)]


def test_bpe_apply_matches_python_replay(spark, sf_dir):
    """bpe_apply's per-doc token counts equal an independent pure-Python
    replay of the persisted merges (rank order, one left-to-right
    non-overlapping fold pass per rule)."""
    import re

    import duckdb

    from debgpt7_8_with_vectordb_spark.plans import QUERIES
    from debgpt7_8_with_vectordb_spark.plans.text_queries import (
        _bpe_merges_cached,
    )

    merges = _bpe_merges_cached(spark, sf_dir)

    def apply_word(word):
        syms = list(word)
        for _, lhs, rhs in merges:
            out = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(s)
            syms = out
        return len(syms)

    docs = duckdb.sql(
        f"SELECT doc_id, coalesce(text,'') AS text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    expect = {}
    for doc_id, text in docs:
        ws = [w for w in re.split(r"\s+", text) if w]
        if ws:
            expect[doc_id] = sum(apply_word(w) for w in ws)

    rows = QUERIES["bpe_apply"](spark, sf_dir).collect()
    got = {r["doc_id"]: r["n_tokens"] for r in rows}
    assert got == expect
