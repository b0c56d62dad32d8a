"""Property-based tests for the vector column functions, driven through
Spark (one batched DataFrame per property run, not per example)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from debgpt7_8_with_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    truncate_dim,
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
vectors = st.lists(finite, min_size=2, max_size=16)


@given(st.lists(st.tuples(vectors, vectors), min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_vector_function_properties(spark, pairs):
    """Batched property drive: cosine ∈ [-1, 1]; cosine(v, v) == 1 for
    nonzero v; dot symmetric; normalize yields unit norm; truncation
    keeps a prefix."""
    pairs = [(a, b[: len(a)] + a[len(b):]) for a, b in pairs]  # same dims
    rows = [(i, [float(x) for x in a], [float(y) for y in b]) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, a array<float>, b array<float>")
    out = df.select(
        "id",
        cosine_similarity(F.col("a"), F.col("b")).alias("cos_ab"),
        cosine_similarity(F.col("b"), F.col("a")).alias("cos_ba"),
        cosine_similarity(F.col("a"), F.col("a")).alias("cos_aa"),
        dot(F.col("a"), F.col("b")).alias("d_ab"),
        dot(F.col("b"), F.col("a")).alias("d_ba"),
        l2_norm(l2_normalize(F.col("a"))).alias("unit"),
        l2_norm(F.col("a")).alias("norm_a"),
        F.slice(F.col("a"), 1, 2).alias("a_prefix"),
        truncate_dim(F.col("a"), 2).alias("a_trunc"),
    ).collect()
    for r in out:
        i = r["id"]
        a, b = pairs[i]
        if r["cos_ab"] is not None and not math.isnan(r["cos_ab"]):
            assert -1.0 - 1e-9 <= r["cos_ab"] <= 1.0 + 1e-9
            assert r["cos_ab"] == pytest.approx(r["cos_ba"], abs=1e-9)
        if r["norm_a"] and r["norm_a"] > 1e-6:
            assert r["cos_aa"] == pytest.approx(1.0, abs=1e-6)
            assert r["unit"] == pytest.approx(1.0, abs=1e-6)
        assert r["d_ab"] == pytest.approx(r["d_ba"], rel=1e-9, abs=1e-9)
        assert list(r["a_trunc"]) == list(r["a_prefix"])
