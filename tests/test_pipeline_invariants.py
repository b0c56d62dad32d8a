"""Round-3 pipeline-operator invariants on sf0.001 (second corpus —
the oracles pin exact values at sf0.01; these pin the CONTRACTS).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from debgpt7_8_with_vectordb_spark.plans import QUERIES
from debgpt7_8_with_vectordb_spark.tables import load_table


def test_corpus_mixture_fractions_sum_to_one(spark, sf_dir):
    rows = QUERIES["corpus_mixture"](spark, sf_dir).collect()
    assert sum(r["frac_docs"] for r in rows) == pytest.approx(1.0, abs=1e-3)
    assert sum(r["frac_tokens"] for r in rows) == pytest.approx(1.0, abs=1e-3)
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_contamination_filter_is_train_subset(spark, sf_dir):
    kept = QUERIES["contamination_filter"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_train = docs.filter(F.col("doc_id") % 97 != 0).count()
    rows = kept.collect()
    assert 0 < len(rows) <= n_train
    assert all(r["doc_id"] % 97 != 0 for r in rows)  # eval never ships
    assert all(r["n_shared"] < 5 for r in rows)


def test_minhash_fidelity_bounds(spark):
    # run at sf0.01 where verified pairs exist (sf0.001 may have none)
    row = QUERIES["minhash_fidelity"](spark, "/root/testdata/sf0.01").head()
    assert row["n_pairs"] > 0
    assert 0.0 <= row["mae"] <= row["max_err"] <= 1.0
    # k=32 sketch on a J>=0.8 population: MAE must sit well under the
    # uniform-J bound 1/sqrt(k) ~ 0.18
    assert row["mae"] < 0.18


def test_ann_pq_shape_and_determinism(spark, sf_dir):
    a = QUERIES["ann_pq"](spark, sf_dir).collect()
    b = QUERIES["ann_pq"](spark, sf_dir).collect()
    assert len(a) == 5
    assert [(r["id"], r["score"]) for r in a] == [(r["id"], r["score"]) for r in b]
    scores = [r["score"] for r in a]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.001 <= s <= 1.001 for s in scores)


def test_ivfpq_subset_of_probed_clusters(spark, sf_dir):
    # every IVFADC hit must come from the 2 probed coarse clusters
    from debgpt7_8_with_vectordb_spark.plans.retrieval_queries import (
        _ivf_index_cached,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = {r["id"] for r in QUERIES["ann_ivfpq"](spark, sf_dir).collect()}
    assert len(out) == 5
    indexed, _ = _ivf_index_cached(spark, sf_dir, emb)
    clusters = {
        r["cluster_id"]
        for r in indexed.filter(F.col("id").isin(list(out))).collect()
    }
    assert len(clusters) <= 2


def test_stream_windowed_topk_rank_contract(spark, sf_dir):
    rows = QUERIES["stream_windowed_topk"](spark, sf_dir).collect()
    assert rows
    by_win: dict = {}
    for r in rows:
        by_win.setdefault(r["window_start"], []).append(r)
    for win, group in by_win.items():
        ranks = sorted(r["rnk"] for r in group)
        assert ranks == list(range(1, len(group) + 1)) and len(group) <= 3
        # ranks ordered by count desc, type asc
        ordered = sorted(group, key=lambda r: (-r["n_events"], r["event_type"]))
        assert [r["rnk"] for r in ordered] == ranks
        for r in group:
            assert (r["window_end"] - r["window_start"]).total_seconds() == 86400


def test_components_tolerate_self_loops_and_duplicates(spark):
    import pyspark.sql.functions as F

    from debgpt7_8_with_vectordb_spark.operators.graph import connected_components

    nodes = spark.range(6).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 0), (1, 2), (1, 2), (2, 1), (3, 3)], "src long, dst long"
    )
    sym = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels, _ = connected_components(nodes, sym)
    got = {r["doc_id"]: r["lab"] for r in labels.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4, 5: 5}


def test_cold_sweep_covers_every_artifact_root():
    """tools/cold_sweep.py must clear EVERY /tmp cache root the package
    writes — a root missing from its list silently stays warm and
    defeats the cold-start gate (VERDICT r5 #7)."""
    import os
    import re
    import sys

    sys.path.insert(0, "tools")
    from cold_sweep import ARTIFACT_ROOTS

    pkg = os.path.join(os.path.dirname(__file__), "..", "debgpt7_8_with_vectordb_spark")
    found = set()
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            with open(os.path.join(root, f)) as fh:
                found.update(re.findall(r"/tmp/spark_graft[a-z_]*", fh.read()))
    uncovered = {
        r for r in found
        if not any(r == a or r.startswith(a + "/") or a.startswith(r)
                   for a in ARTIFACT_ROOTS)
    }
    assert not uncovered, f"cold_sweep misses cache roots: {sorted(uncovered)}"
