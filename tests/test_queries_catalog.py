"""Catalog-level smoke + targeted semantics tests at sf0.001.

The full DuckDB-oracle comparison lives in tools/check_oracle.py (it is
the local replica of the driver gate and is run before every commit);
here we assert structural properties cheap enough for CI.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from debgpt7_8_with_vectordb_spark.plans import ORACLE, QUERIES


# queries allowed to lack a DuckDB oracle. EMPTY as of round 3: the last
# two holdouts fell — ann_ivf_kmeans oracles the probe over a persisted
# seeded centroid table, and mapreduce_echo_compact replays the greedy
# packed-reduce round count with a list-state recursive CTE.
ROWS_ONLY: set[str] = set()


def test_catalog_is_populated():
    assert len(QUERIES) >= 40
    # every oracle has a matching query
    assert set(ORACLE) <= set(QUERIES)
    # every query is oracle-checked except the declared rows-only set
    assert set(QUERIES) - set(ORACLE) == ROWS_ONLY


def test_flagship_topk(spark, sf_dir):
    rows = QUERIES["topk_retrieval"](spark, sf_dir).collect()
    assert len(rows) == 3
    # self-similarity: the query vector is vec_id 0's embedding → rank 1
    by_score = sorted(rows, key=lambda r: -r["score"])
    assert by_score[0]["vec_id"] == 0
    assert by_score[0]["score"] == pytest.approx(1.0)


def test_filtered_retrieval_respects_filter(spark, sf_dir):
    rows = QUERIES["topk_retrieval_filtered"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["label"] == 3 for r in rows)


def test_knn_join_shape(spark, sf_dir):
    rows = QUERIES["knn_join"](spark, sf_dir).collect()
    assert len(rows) == 15  # 5 queries × top-3
    assert all(r["qid"] != r["vec_id"] for r in rows)  # self excluded


def test_vector_normalize_unit(spark, sf_dir):
    rows = QUERIES["vector_normalize"](spark, sf_dir).collect()
    assert all(r["unit_norm"] == pytest.approx(1.0) for r in rows)


def test_dedup_exact_finds_planted_duplicates(spark):
    # duplicates are planted at sf0.1 (5000 docs, 4992 distinct texts)
    rows = QUERIES["dedup_exact"](spark, "/root/testdata/sf0.1").collect()
    total = sum(r["dup_count"] for r in rows)
    assert total == 5000
    assert any(r["dup_count"] > 1 for r in rows)


def test_minhash_candidates_superset_of_exact_dups(spark):
    """Exact duplicate pairs MUST collide in every MinHash band, so each
    appears among LSH candidates — recall=1 on exact dups."""
    from debgpt7_8_with_vectordb_spark.tables import load_table
    import pyspark.sql.functions as F

    sf_dir = "/root/testdata/sf0.1"
    docs = load_table(spark, sf_dir, "documents")
    dup_pairs = {
        (a, b)
        for digest, ids in (
            docs.groupBy(F.md5(F.col("text").cast("binary")).alias("d"))
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") > 1)
            .select("d", "ids")
            .rdd.map(lambda r: (r["d"], sorted(r["ids"])))
            .collect()
        )
        for a in ids
        for b in ids
        if a < b
    }
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert dup_pairs, "testdata should contain exact duplicates"
    assert dup_pairs <= cands


def test_ngram_jaccard_banded_blocking_catches_one_char_edit(spark, tmp_path):
    """Round-2 banded blocking (lang, n_chars div 16): a near-dup pair
    differing by ONE char (lengths 59/60, same div-16 band) must surface
    — round-1's exact-length blocking structurally never could."""
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy dogs again and again"
    docs = spark.createDataFrame(
        [
            (1, a, "en", "s1", len(a)),
            (2, b, "en", "s2", len(b)),
            (3, "completely different words entirely", "en", "s3", 35),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    pairs = QUERIES["dedup_ngram_jaccard"](spark, str(tmp_path)).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] >= 0.8  # 9 shared / 11 union tokens


def test_ngram_jaccard_intersect_evaluated_exactly_once(spark, sf_dir):
    """Round-6 perf fix (VERDICT r5 watch item): the admission filter
    and the output ratio both reference `inter`, and Catalyst's
    projection collapse + filter pushdown used to inline the
    array_intersect at every reference (~3 evaluations per pair —
    1.96x of the r1 bench anchor). The struct-explode Generate barrier
    in _ngram_jaccard_from pins it to exactly ONE array_intersect in
    the physical plan."""
    plan = (
        QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("array_intersect") == 1, plan


def test_recall_sweep_monotone_in_nprobe(spark, sf_dir):
    """Probe sets nest, so recall@10 must be nondecreasing in nprobe;
    probing every cluster would be exact (recall 1.0 at nprobe=k)."""
    rows = sorted(
        (r["nprobe"], r["recall_at_10"])
        for r in QUERIES["ann_recall_sweep"](spark, sf_dir).collect()
    )
    assert [p for p, _ in rows] == [1, 2, 4, 8]
    recalls = [rec for _, rec in rows]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    assert 0.0 <= recalls[0] and recalls[-1] <= 1.0


def test_simhash_identical_docs_identical_hash(spark, sf_dir):
    rows = QUERIES["dedup_simhash"](spark, sf_dir).collect()
    assert len(rows) == 500
    assert all(r["simhash"] is not None and r["simhash"] >= 0 for r in rows)


def test_sessionize_counts_sum_to_events(spark, sf_dir):
    rows = QUERIES["sessionize_events"](spark, sf_dir).collect()
    assert sum(r["n_events"] for r in rows) == 1000


def test_entry_contract(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)


def test_lsh_keep_collapses_exact_duplicates(spark):
    """Identical text ⇒ identical signatures ⇒ same buckets in every
    band ⇒ at most ONE of an exact-duplicate class survives the
    keep-rule (and it is the min id)."""
    import pyspark.sql.functions as F

    from debgpt7_8_with_vectordb_spark.plans.dedup_queries import (
        _minhash_bands_from,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (7, "alpha beta gamma"),
         (3, "something else entirely")],
        "doc_id long, text string",
    )
    bands = _minhash_bands_from(docs)
    bucket_min = bands.groupBy("band", "sig").agg(F.min("doc_id").alias("bmin"))
    canon = (
        bands.join(bucket_min, ["band", "sig"])
        .groupBy("doc_id")
        .agg(F.min("bmin").alias("canon_id"))
    )
    rows = {r["doc_id"]: r["canon_id"] for r in canon.collect()}
    assert rows[1] == 1 and rows[2] == 1 and rows[7] == 1  # class collapses to min
    assert rows[3] == 3  # unrelated doc survives independently


def test_corpus_pipeline_funnel_monotone(spark, sf_dir):
    r = QUERIES["corpus_pipeline"](spark, sf_dir).first()
    assert r["n_docs_in"] >= r["n_qualified"] >= r["n_survivors"] > 0
    assert r["n_chunks"] == r["n_vectors"] >= r["n_survivors"]
    assert r["sum_raw_norms"] > 0


def test_sample_stratified_deterministic_and_mixing(spark, sf_dir):
    """The sampling ticket is a pure hash of doc_id: reruns keep the
    IDENTICAL sample (df.sample's RNG cannot promise that), and the
    dominant 'en' stratum is downweighted to ~its 0.3 rate."""
    a = {r["doc_id"] for r in QUERIES["sample_stratified"](spark, sf_dir).collect()}
    b = {r["doc_id"] for r in QUERIES["sample_stratified"](spark, sf_dir).collect()}
    assert a == b and a

    from debgpt7_8_with_vectordb_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_en = docs.filter(F.col("lang") == "en").count()
    kept_en = (
        QUERIES["sample_stratified"](spark, sf_dir)
        .filter(F.col("lang") == "en")
        .count()
    )
    assert 0.15 <= kept_en / n_en <= 0.45  # ~0.3 modulo hash noise


def test_dedup_incremental_novel_only(spark, sf_dir):
    """Every surviving batch doc's digest must be absent from the prior
    half; planted cross-half duplicates must be suppressed."""
    from debgpt7_8_with_vectordb_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    split = docs.agg((F.max("doc_id") / 2).cast("long")).head()[0]
    prior_digests = {
        r[0]
        for r in docs.filter(F.col("doc_id") < split)
        .select(F.md5(F.col("text").cast("binary")))
        .distinct()
        .collect()
    }
    out = QUERIES["dedup_incremental"](spark, sf_dir).collect()
    assert out and all(r["digest"] not in prior_digests for r in out)


def test_dedup_incremental_suppresses_planted_cross_half_dup(spark, tmp_path):
    """A batch doc whose text already exists in the prior half must be
    suppressed; novel batch docs survive."""
    rows = [(i, f"unique text {i}", "en", f"s{i}", 20) for i in range(10)]
    rows.append((11, "unique text 3", "en", "s11", 20))  # dup of prior doc 3
    rows.append((12, "genuinely new", "en", "s12", 13))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"] for r in QUERIES["dedup_incremental"](spark, str(tmp_path)).collect()}
    # split = max/2 = 6: batch docs are 6..12; 11 is suppressed (dup of 3)
    assert 11 not in out and 12 in out
    assert out == {6, 7, 8, 9, 12}


def test_embedding_quantize_error_bound(spark, sf_dir):
    """Symmetric int8 quantization: reconstruction error of any
    component is at most scale/2 (round-to-nearest), rmse <= max_err."""
    rows = QUERIES["embedding_quantize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_err"] <= r["scale"] / 2 + 1e-6
        assert r["rmse"] <= r["max_err"] + 1e-6


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    from debgpt7_8_with_vectordb_spark.plans.dedup_queries import (
        dedup_clusters,
        dedup_minhash_verified,
    )

    labels = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(spark, sf_dir).collect()
    }
    # every verified near-dup pair lands in the same cluster
    for p in dedup_minhash_verified(spark, sf_dir).collect():
        assert labels[p["doc_a"]][0] == labels[p["doc_b"]][0]
    # cluster id IS the min member id; sizes count the members
    from collections import Counter

    members = Counter(cid for cid, _ in labels.values())
    for doc_id, (cid, size) in labels.items():
        assert cid <= doc_id
        assert size == members[cid]
    assert all(labels[cid][0] == cid for cid, _ in labels.values())


def test_dedup_recall_exact_tier_is_total(spark, sf_dir):
    """Equal token sets ⇒ equal minhash signatures ⇒ every jaccard-1.0
    truth pair MUST be an LSH candidate (recall exactly 1.0); lower
    tiers are monotone in the S-curve."""
    rows = {r["tier"]: r for r in QUERIES["dedup_recall"](spark, sf_dir).collect()}
    if 1.0 in rows:
        assert rows[1.0]["recall"] == 1.0
    tiers = sorted(rows)
    recalls = [rows[t]["recall"] for t in tiers]
    assert recalls == sorted(recalls)  # higher similarity ⇒ higher recall
    for r in rows.values():
        assert 0 <= r["n_hit"] <= r["n_truth"]


def test_dedup_recall_sampled_same_invariants(spark, sf_dir):
    """The 1.0 hard invariant holds on ANY deterministic sample, and the
    sampled truth must be a subset of the full gate's scale (fewer or
    equal truth pairs per tier)."""
    full = {r["tier"]: r for r in QUERIES["dedup_recall"](spark, sf_dir).collect()}
    samp = {
        r["tier"]: r for r in QUERIES["dedup_recall_sampled"](spark, sf_dir).collect()
    }
    if 1.0 in samp:
        assert samp[1.0]["recall"] == 1.0
    for t, r in samp.items():
        assert 0 <= r["n_hit"] <= r["n_truth"]
        if t in full:
            assert r["n_truth"] <= full[t]["n_truth"]
