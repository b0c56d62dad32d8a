"""Independent replay pins for the PQ/IVF training artifacts
(VERDICT r5 next-round #8): BPE merges and simhash have pure-Python
replays; the k-means family trains via seeded spark.ml, whose random
init is not replayable outside the JVM — so the pins are:

1. EXACT FIXPOINT on zero-variance blobs: with every blob's points
   bit-identical and a pinned seed whose init covers all blobs, Lloyd's
   converged centroids must equal the blob vectors BIT-FOR-BIT (the
   mean of n identical exactly-representable doubles is that double) —
   an independently-predicted result no summation-order drift can
   excuse.
2. CACHE == FRESH RETRAIN, byte-equal, on the real sf0.001 corpus: the
   stale-artifact guard. The oracle handoff assumes a cached artifact
   is exactly what retraining would produce; a silent spark.ml change
   or a corrupt cache breaks this test before it breaks an oracle.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
import pytest

from debgpt7_8_with_vectordb_spark.functions.vector import l2_normalize
from debgpt7_8_with_vectordb_spark.operators.ann import (
    build_ivf_index,
    build_pq_codebooks,
)

SF_DIR = "/root/testdata/sf0.001"

#: pinned seeds whose MLlib random init lands one sample in every blob
#: (searched once; the test fails loudly if an MLlib upgrade changes
#: the seeded sampling, which is exactly the drift it exists to catch)
_IVF_TOY_SEED = 11
_PQ_TOY_SEED = 0


def test_ivf_kmeans_exact_fixpoint_on_zero_variance_blobs(spark):
    blobs = []
    for b in range(4):
        v = [0.0] * 8
        v[b] = 1.0
        blobs.append(v)
    emb = spark.createDataFrame(
        [(i, blobs[i % 4]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    indexed, cents = build_ivf_index(emb, k=4, seed=_IVF_TOY_SEED, max_iter=8)
    assert sorted(map(tuple, cents)) == sorted(map(tuple, blobs))
    # every copy of a blob lands in the same cluster, and the cluster's
    # centroid IS the blob vector
    rows = indexed.collect()
    assert len(rows) == 12
    for r in rows:
        assert tuple(cents[r["cluster_id"]]) == tuple(r["nv"])


def test_pq_codebooks_exact_fixpoint_on_zero_variance_blobs(spark):
    subs = [(1.0, 0.0), (0.0, 1.0)]
    pts = [list(a + b) for a, b in itertools.product(subs, subs)] * 3
    normed = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "id long, nv array<double>"
    )
    books = build_pq_codebooks(normed, m=2, ksub=2, seed=_PQ_TOY_SEED)
    assert len(books) == 2
    for bk in books:
        assert sorted(map(tuple, bk)) == sorted(map(tuple, subs))


@pytest.fixture()
def sf001_normed(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("id"),
        l2_normalize(F.col("embedding").cast("array<double>")).alias("nv"),
    )


def test_ivf_cached_artifact_matches_fresh_retrain(spark):
    from debgpt7_8_with_vectordb_spark.plans.retrieval_queries import (
        _IVF_K,
        _IVF_SEED,
        _ivf_index_cached,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    indexed_cached, cents_cached = _ivf_index_cached(spark, SF_DIR, emb)
    indexed_fresh, cents_fresh = build_ivf_index(emb, k=_IVF_K, seed=_IVF_SEED)
    # centroid list byte-equal (cache stores by cluster_id; builder
    # returns in cluster order already)
    assert [list(c) for c in cents_cached] == [list(c) for c in cents_fresh]
    # assignments byte-equal per id
    a = {r["id"]: (r["cluster_id"], tuple(r["nv"])) for r in indexed_cached.collect()}
    b = {r["id"]: (r["cluster_id"], tuple(r["nv"])) for r in indexed_fresh.collect()}
    assert a == b


def test_pq_cached_codebooks_match_fresh_retrain(spark, sf001_normed):
    from debgpt7_8_with_vectordb_spark.plans.retrieval_queries import (
        _PQ_KSUB,
        _PQ_M,
        _PQ_SEED,
        _pq_codebooks_cached,
    )

    cached = _pq_codebooks_cached(spark, SF_DIR, sf001_normed)
    fresh = build_pq_codebooks(
        sf001_normed, m=_PQ_M, ksub=_PQ_KSUB, seed=_PQ_SEED
    )
    assert cached == fresh
