"""Accuracy gates for the documented 100 TB sketch swaps.

SCALING.md and several docstrings (corpus_quantiles, dedup_recall,
topk_ngrams) name the approximate operator each exact catalog query
swaps to at scale — t-digest quantiles, HyperLogLog distinct counts,
count-min frequency estimates. The repo's philosophy is that
approximation is MONITORED, not assumed (the ANN/dedup recall gates);
these tests extend that to the sketch swaps themselves: each sketch is
run next to its exact twin on real corpus data and its published error
bound is asserted, so the swap is a measured recipe rather than a
docstring promise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.01"  # 500 docs — big enough for rank-error math


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_approx_percentile_rank_error_within_accuracy(spark, docs):
    """corpus_quantiles' swap: approx_percentile(accuracy=A) guarantees
    rank error ≤ n/A per group. Check the returned value's true rank."""
    accuracy = 100
    pcts = [0.5, 0.9, 0.99]
    approx = {
        (r["lang"], p): r[f"q{i}"]
        for r in docs.groupBy("lang")
        .agg(
            *[
                F.approx_percentile("n_chars", F.lit(p), F.lit(accuracy)).alias(
                    f"q{i}"
                )
                for i, p in enumerate(pcts)
            ]
        )
        .collect()
        for i, p in enumerate(pcts)
    }
    by_lang: dict[str, list[int]] = {}
    for r in docs.select("lang", "n_chars").collect():
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        for p in pcts:
            got = approx[(lang, p)]
            # true rank range occupied by the returned value
            lo = sum(1 for v in vals if v < got)
            hi = sum(1 for v in vals if v <= got)
            target = p * n
            tol = n / accuracy + 1  # +1: discrete rank boundaries
            assert lo - tol <= target <= hi + tol, (
                f"{lang} p{p}: value {got} spans ranks [{lo},{hi}], "
                f"target {target:.1f} ± {tol:.1f} of n={n}"
            )


def test_hll_distinct_within_published_rsd(docs):
    """dedup_exact's profile twin: HLL distinct digests vs exact count.
    Spark's HLL++ bound: relative error ≤ rsd with 1σ; assert 4σ."""
    rsd = 0.05
    row = docs.select(
        F.countDistinct("text").alias("exact"),
        F.approx_count_distinct("text", rsd).alias("approx"),
    ).collect()[0]
    rel = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel <= 4 * rsd, f"HLL rel error {rel:.4f} > {4 * rsd}"


def test_count_min_overestimates_within_epsilon(spark, docs):
    """topk_ngrams' swap for heavy-hitter counting at 100 TB: count-min
    never undercounts, and overcounts by ≤ ε·N with prob 1-δ."""
    eps, conf, seed = 0.001, 0.99, 42
    toks = docs.select(
        F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("w")
    )
    n_total = toks.count()
    exact = {r["w"]: r["c"] for r in toks.groupBy("w").agg(F.count("*").alias("c")).collect()}
    sketch_bytes = toks.agg(
        F.count_min_sketch(F.col("w"), F.lit(eps), F.lit(conf), F.lit(seed)).alias("s")
    ).collect()[0]["s"]
    # probe the sketch via the JVM sketch library (no SQL estimator fn)
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    overshoot_bound = eps * n_total
    bad = 0
    for w, true in exact.items():
        est = cms.estimateCount(w)
        assert est >= true, f"count-min undercounted {w}: {est} < {true}"
        if est - true > overshoot_bound:
            bad += 1
    # failure probability δ = 1-conf per query; allow generous slack
    assert bad <= max(3, int(len(exact) * (1 - conf) * 5)), (
        f"{bad}/{len(exact)} tokens overcounted beyond eps*N={overshoot_bound:.1f}"
    )
