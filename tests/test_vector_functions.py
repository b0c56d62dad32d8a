"""Vector math unit tests — reference-style exact expectations
(test strategy modeled on the reference's planted-vector checks,
tests/test_vectordb.py:65-88, 134-151)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from debgpt7_8_with_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    truncate_dim,
    vector_lit,
)


def one_row(spark):
    return spark.range(1)


def test_dot_product(spark):
    row = one_row(spark).select(
        dot(vector_lit([1.0, 2.0, 3.0]), vector_lit([4.0, 5.0, 6.0])).alias("d")
    ).head()
    assert row["d"] == pytest.approx(32.0)


def test_l2_norm(spark):
    row = one_row(spark).select(l2_norm(vector_lit([3.0, 4.0])).alias("n")).head()
    assert row["n"] == pytest.approx(5.0)


def test_normalize_known_vector(spark):
    # analytically-known unit vector (reference test_vectordb.py:65-88)
    row = one_row(spark).select(l2_normalize(vector_lit([3.0, 4.0])).alias("v")).head()
    assert row["v"][0] == pytest.approx(0.6)
    assert row["v"][1] == pytest.approx(0.8)


def test_normalize_zero_vector_guard(spark):
    row = one_row(spark).select(l2_normalize(vector_lit([0.0, 0.0])).alias("v")).head()
    assert row["v"] == [0.0, 0.0]


def test_truncate_then_normalize_insert_invariant(spark):
    # the reference insert invariant: truncate FIRST, then normalize
    # (vectordb.py:81-86) — order matters.
    v = [1.0, 1.0, 1.0, 1.0, 100.0]
    row = (
        one_row(spark)
        .select(l2_normalize(truncate_dim(vector_lit(v), 4)).alias("v"))
        .head()
    )
    assert row["v"][0] == pytest.approx(0.5)


def test_cosine_self_is_one(spark):
    row = (
        one_row(spark)
        .select(
            cosine_similarity(vector_lit([0.3, -0.4, 0.5]), vector_lit([0.3, -0.4, 0.5])).alias(
                "c"
            )
        )
        .head()
    )
    assert row["c"] == pytest.approx(1.0)


def test_cosine_orthogonal(spark):
    row = (
        one_row(spark)
        .select(cosine_similarity(vector_lit([1.0, 0.0]), vector_lit([0.0, 1.0])).alias("c"))
        .head()
    )
    assert row["c"] == pytest.approx(0.0)


def test_planted_ones_ranks_first(spark):
    """Planted-vector top-1 (reference test_vectordb.py:134-151): a stored
    vector equal to the query direction must rank first with score≈1."""
    dim = 8
    import random

    rnd = random.Random(42)
    rows = [(0, [1.0] * dim)] + [
        (i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0 / math.sqrt(dim)] * dim
    scored = df.select(
        "vec_id", cosine_similarity(F.col("embedding"), vector_lit(q)).alias("score")
    )
    top = scored.orderBy(F.desc("score"), "vec_id").limit(1).head()
    assert top["vec_id"] == 0
    assert top["score"] == pytest.approx(1.0)


def test_zero_vector_cosine_cross_engine_null(spark):
    """r12 fuzz seed 135: DuckDB's list_cosine_similarity returns -1.0
    BY CONVENTION when either operand is the zero vector; the engine
    yields NULL (try_divide — the reference's np-divide would warn and
    emit NaN). Every oracle cosine goes through the zero-norm-guarded
    _cos fragment so both engines say NULL for degenerate pairs and
    stay bit-identical elsewhere.

    ADVICE r12 #1 hardening: the guard now computes the divisor the way
    the engine does — NULL iff sqrt(Σa²)·sqrt(Σb²) = 0.0 — so the
    subnormal band pins too: components ~1e-170 square-underflow to a
    zero SUM (NULL both sides), while ~2.3e-162 components leave a
    min-subnormal norm product (2^-537 squares exactly back to 2^-1074,
    never 0), so both engines still score that pair."""
    import duckdb

    from debgpt7_8_with_vectordb_spark.functions.vector import (
        cosine_similarity,
    )
    from debgpt7_8_with_vectordb_spark.plans.retrieval_queries import _cos

    vecs = [
        ([0.0, 0.0], [1.0, 2.0]),
        ([0.0, 0.0], [0.0, 0.0]),
        ([1.0, 0.0], [0.0, 1.0]),
        ([1.0, 2.0], [1.0, 2.0]),
        ([1.0, 0.0], [-1.0, 0.0]),
        ([1e-170, 1e-170], [1.0, 2.0]),  # squares underflow → Σ=0 → NULL
        ([2.3e-162, 0.0], [2.3e-162, 0.0]),  # min-subnormal norms → 1.0
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b in vecs], "a array<double>, b array<double>"
    )
    got = [
        None if r[0] is None else round(r[0], 6)
        for r in df.select(
            F.round(cosine_similarity(F.col("a"), F.col("b")), 6)
        ).collect()
    ]
    con = duckdb.connect()
    oracle = [
        con.execute(
            "SELECT " + _cos(f"{a}::DOUBLE[]", f"{b}::DOUBLE[]")
        ).fetchone()[0]
        for a, b in vecs
    ]
    oracle = [None if v is None else round(v, 6) for v in oracle]
    assert got == oracle == [None, None, 0.0, 1.0, -1.0, None, 1.0]
