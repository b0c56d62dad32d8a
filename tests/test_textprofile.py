"""repetition_counts / repetition_stats / contamination_check semantics.

The cross-engine value check lives in tools/check_oracle.py; here we pin
the operator's counting semantics on hand-built rows (mode counts,
degenerate docs) and the contamination flag's recall on an exact copy of
an eval-split document.
"""

from __future__ import annotations

import pytest

from debgpt7_8_with_vectordb_spark.operators.textprofile import repetition_counts
from debgpt7_8_with_vectordb_spark.plans import QUERIES


def _counts(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in repetition_counts(df).collect()}


def test_repetition_counts_hand_checked(spark):
    got = _counts(
        spark,
        [
            (0, "a b a b a"),  # tokens: a×3 b×2; bigrams: 'a b'×2 'b a'×2
            (1, "x"),  # single token → no bigram
            (2, ""),  # token-less
            (3, None),  # NULL ≡ '' contract
            (4, "  spaced   out  "),  # whitespace runs collapse
        ],
    )
    assert got[0] == {
        "doc_id": 0,
        "n_tokens": 5,
        "n_distinct": 2,
        "top_token_count": 3,
        "top_bigram_count": 2,
    }
    assert got[1] == {
        "doc_id": 1,
        "n_tokens": 1,
        "n_distinct": 1,
        "top_token_count": 1,
        "top_bigram_count": 0,
    }
    for d in (2, 3):
        assert got[d]["n_tokens"] == 0
        assert got[d]["top_token_count"] == 0
    assert got[4]["n_tokens"] == 2
    assert got[4]["n_distinct"] == 2


def test_repetition_stats_ratio_guards(spark, sf_dir):
    rows = QUERIES["repetition_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r["n_tokens"]
        if n == 0:
            assert r["dup_token_frac"] is None
            assert r["top_token_frac"] is None
        else:
            assert 0.0 <= r["dup_token_frac"] <= 1.0
            # the modal token's count is at least the uniform share
            assert r["top_token_count"] * r["n_distinct"] >= n
        if n < 2:
            assert r["top_bigram_frac"] is None


def test_topk_ngrams_is_sorted_topk(spark, sf_dir):
    rows = QUERIES["topk_ngrams"](spark, sf_dir).collect()
    assert len(rows) == 20
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["ngram"].split(" ")) == 2 for r in rows)


def test_contamination_flags_exact_copy_of_eval_doc(spark, tmp_path):
    """A training doc that is an exact copy of an eval-split doc shares
    every shingle → overlap_frac 1.0; an unrelated doc is not flagged."""
    import duckdb

    d = str(tmp_path / "corpus")
    con = duckdb.connect()
    con.execute(f"CREATE TABLE src AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'")
    # doc 0 is in the eval split (0 % 97 == 0); plant doc 9001 as its copy
    # and doc 9002 as a token sequence disjoint from the whole corpus
    con.execute(
        """
        INSERT INTO src
        SELECT 9001, text, lang, source, n_chars FROM src WHERE doc_id = 0
        UNION ALL
        SELECT 9002, 'zzq1 zzq2 zzq3 zzq4 zzq5', 'en', 'synthetic', 24
        """
    )
    import os

    os.makedirs(d, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet') TO '{d}/{t}.parquet'"
        )
    con.execute(f"COPY src TO '{d}/documents.parquet'")

    got = {
        r["doc_id"]: r for r in QUERIES["contamination_check"](spark, d).collect()
    }
    assert got[9001]["overlap_frac"] == pytest.approx(1.0)
    assert 9002 not in got


def test_word_shingles_degenerate_texts(spark):
    """try_element_at, not element_at: under ANSI mode a past-the-end
    probe on a short/empty token array must yield the truncated shingle,
    not raise (edge-gate regression)."""
    import pyspark.sql.functions as F
    from debgpt7_8_with_vectordb_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("one two",), ("one two three four",)],
        "text string",
    )
    out = [r["sh"] for r in df.select(word_shingles(F.col("text"), 3).alias("sh")).collect()]
    assert out[0] == [""]          # no tokens: single empty shingle
    assert out[1] == [""]
    assert out[2] == ["one"]       # truncated shingle below n tokens
    assert out[3] == ["one two"]
    assert out[4] == ["one two three", "two three four"]
