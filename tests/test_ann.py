"""KMeans-IVF index: build, probe, recall properties."""

from __future__ import annotations

import pytest

from debgpt7_8_with_vectordb_spark.operators.ann import (
    build_ivf_index,
    probe_ivf,
    recall_at_k,
)


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    indexed, centroids = build_ivf_index(emb, k=8, seed=42)
    indexed = indexed.localCheckpoint(eager=True)  # freeze the clustering
    return indexed, centroids, emb


def test_index_covers_corpus(index, spark, sf_dir):
    indexed, centroids, emb = index
    assert indexed.count() == emb.count()
    assert len(centroids) == 8
    assert indexed.select("cluster_id").distinct().count() <= 8


def test_probe_all_clusters_is_exact(index):
    """nprobe = k probes everything → identical to brute force."""
    indexed, centroids, _ = index
    q = indexed.filter("id = 2").select("nv").head()[0]
    assert recall_at_k(indexed, centroids, list(q), nprobe=len(centroids), k=10) == 1.0


def test_recall_monotonic_in_nprobe(index):
    indexed, centroids, _ = index
    q = indexed.filter("id = 2").select("nv").head()[0]
    recalls = [
        recall_at_k(indexed, centroids, list(q), nprobe=n, k=10) for n in (1, 2, 4, 8)
    ]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0


def test_probe_reads_only_selected_clusters(index):
    indexed, centroids, _ = index
    q = indexed.filter("id = 2").select("nv").head()[0]
    out = probe_ivf(indexed, centroids, list(q), nprobe=2, topk=10)
    assert out.select("cluster_id").distinct().count() <= 2


def test_build_deterministic_with_seed(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    a, ca = build_ivf_index(emb, k=4, seed=7)
    b, cb = build_ivf_index(emb, k=4, seed=7)
    assert ca == cb
    assert sorted(map(tuple, a.select("id", "cluster_id").collect())) == sorted(
        map(tuple, b.select("id", "cluster_id").collect())
    )
