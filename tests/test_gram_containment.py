"""embedding_gram exactness + fingerprint_containment doc-in-doc."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from debgpt7_8_with_vectordb_spark.plans import QUERIES
from debgpt7_8_with_vectordb_spark.plans.retrieval_queries import (
    _GRAM_DIM,
    _GRAM_Q,
)


def test_gram_matches_numpy_exactly(spark, sf_dir):
    """The distributed integer Gram equals the single-machine numpy one
    bit-for-bit — the associativity claim the quantization buys."""
    rows = QUERIES["embedding_gram"](spark, sf_dir).collect()
    got = {(r["i"], r["j"]): r["gram"] for r in rows}
    assert len(got) == _GRAM_DIM * (_GRAM_DIM + 1) // 2

    emb = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    X = np.array([e[0] for e in emb], dtype=np.float64)
    Q = np.floor(X * _GRAM_Q).astype(np.int64)
    G = Q.T @ Q
    for (i, j), v in got.items():
        assert v == G[i - 1, j - 1], (i, j)


def test_gram_diagonal_nonnegative(spark, sf_dir):
    rows = QUERIES["embedding_gram"](spark, sf_dir).collect()
    for r in rows:
        assert r["i"] <= r["j"]
        if r["i"] == r["j"]:
            assert r["gram"] >= 0


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


def test_containment_detects_doc_in_doc(spark, tmp_path):
    """A doc wholly quoted inside a much larger doc has high
    containment (A-side) even though the pair's Jaccard is low — the
    case symmetric dedup measures miss."""
    inner = "zebra quartz jovial wombat kayak plinth gizmo vortex " * 6
    filler = " ".join(f"fill{i}word{i * 7 % 13}" for i in range(400))
    docs = [inner, filler[: len(filler) // 2] + " " + inner + " " + filler,
            "completely unrelated tiny text about nothing at all"]
    d = _write_docs(tmp_path, docs)
    rows = QUERIES["fingerprint_containment"](spark, d).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (0, 1) in pairs, f"doc-in-doc pair missed: {pairs.keys()}"
    r = pairs[(0, 1)]
    assert r["cont_a"] >= 0.5, r
    # the big doc is NOT contained in the small one
    assert r["cont_b"] < r["cont_a"]
    assert not any(2 in p for p in pairs), pairs.keys()


def test_pca_project_variance_order_and_orthonormal(spark, sf_dir):
    """Trained components are orthonormal; projected variance is
    non-increasing across p1..p4 (the eigenvalue ordering)."""
    from debgpt7_8_with_vectordb_spark.plans.retrieval_queries import (
        _pca_components_cached,
    )

    mean, comps = _pca_components_cached(spark, sf_dir)
    C = np.array(comps)
    assert C.shape == (4, _GRAM_DIM)
    eye = C @ C.T
    assert np.allclose(eye, np.eye(4), atol=1e-9)

    rows = QUERIES["embedding_pca_project"](spark, sf_dir).collect()
    P = np.array([[r["p1"], r["p2"], r["p3"], r["p4"]] for r in rows])
    var = P.var(axis=0)
    assert all(var[k] >= var[k + 1] - 1e-9 for k in range(3)), var
    # projections of centered data have ~zero mean
    assert np.abs(P.mean(axis=0)).max() < 1e-2


def _write_events(path, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(hours=r[2]) for r in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(path / "events.parquet"))
    return str(path)


def test_event_funnel_strict_order(spark, tmp_path):
    """Stage k+1 only counts events strictly after stage k: a click
    before (or simultaneous with) the signup never converts."""
    d = _write_events(
        tmp_path,
        [
            (1, "signup", 1), (1, "click", 2), (1, "purchase", 3),
            # click pre-signup + click AT the signup instant: stage 1 only
            (2, "click", 0), (2, "signup", 2), (2, "click", 2),
            (2, "purchase", 5),
            (3, "purchase", 1),  # never signed up
        ],
    )
    rows = {r["stage"]: r for r in QUERIES["event_funnel"](spark, d).collect()}
    assert rows[1]["users"] == 2
    assert rows[2]["users"] == 1
    assert rows[3]["users"] == 1
    assert [rows[k]["event_type"] for k in (1, 2, 3)] == [
        "signup", "click", "purchase",
    ]


def test_retention_cohorts_offsets(spark, tmp_path):
    d = _write_events(
        tmp_path,
        [
            (1, "view", 0), (1, "view", 25), (1, "view", 26),  # D0, D1 twice
            (1, "view", 24 * 3),  # D3
            (2, "view", 30),  # first seen D1
        ],
    )
    rows = QUERIES["retention_cohorts"](spark, d).collect()
    got = {(str(r["cohort_day"]), r["day_offset"]): r["users"] for r in rows}
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
    }, got


def test_containment_keep_drops_contained_doc(spark, tmp_path):
    """The keep rule drops the smaller (contained) doc, keeps the
    host, and passes unrelated docs through."""
    inner = "zebra quartz jovial wombat kayak plinth gizmo vortex " * 6
    filler = " ".join(f"fill{i}word{i * 7 % 13}" for i in range(400))
    docs = [inner, filler[: len(filler) // 2] + " " + inner + " " + filler,
            "completely unrelated tiny text about nothing at all"]
    d = _write_docs(tmp_path, docs)
    rows = {r["doc_id"]: r["keep"] for r in
            QUERIES["dedup_containment_keep"](spark, d).collect()}
    assert rows == {0: False, 1: True, 2: True}, rows
