"""functions/rounding.py: exact cross-engine integer-ratio rounding.

Pins the three-way agreement — Spark general form, Spark non-negative
single-reference form, DuckDB fragments — against a Python fractions
reference (round half away from zero), across exhaustive small ranges,
random large values, and the exact half-boundary cases that motivated
the module (round-5 sf0.1 sweep divergences).
"""

from __future__ import annotations

import random
from fractions import Fraction

import duckdb
import pyspark.sql.functions as F

from debgpt7_8_with_vectordb_spark.functions.rounding import (
    half_up_ratio,
    half_up_ratio_nonneg,
    half_up_ratio_nonneg_sql,
    half_up_ratio_sql,
)


def _ref(n: int, d: int) -> int:
    """round-half-away-from-zero(n/d), exact."""
    fr = Fraction(abs(n), d)
    q = fr.numerator // fr.denominator
    if Fraction(abs(n) - q * d, d) >= Fraction(1, 2):
        q += 1
    return -q if n < 0 else q


def _cases() -> list[tuple[int, int]]:
    rng = random.Random(42)
    cases = [(n, d) for n in range(-64, 65) for d in range(1, 20)]
    # half-boundary shapes: d = 2^7 * 5^a (the class that diverged)
    for d in (128, 640, 3200, 16000):
        for k in (1, 3, 5, 7, 1001):
            cases.append((k * d // 2, d))  # exactly x.5
            cases.append((-(k * d // 2), d))
    cases += [
        (rng.randrange(-(2**44), 2**44), rng.randrange(1, 10**6))
        for _ in range(500)
    ]
    return cases


def test_spark_forms_match_reference(spark):
    cases = _cases()
    df = spark.createDataFrame(cases, "n long, d long")
    rows = df.select(
        "n",
        "d",
        half_up_ratio(F.col("n"), F.col("d")).alias("g"),
        half_up_ratio_nonneg(F.abs(F.col("n")), F.col("d")).alias("nn"),
    ).collect()
    for r in rows:
        want = _ref(r["n"], r["d"])
        assert r["g"] == want, (r["n"], r["d"], r["g"], want)
        assert r["nn"] == abs(want), (r["n"], r["d"], r["nn"], want)


def test_duckdb_fragments_match_reference():
    cases = _cases()
    vals = ",".join(f"({n}::BIGINT,{d}::BIGINT)" for n, d in cases)
    g = half_up_ratio_sql("n", "d")
    nn = half_up_ratio_nonneg_sql("abs(n)", "d")
    rows = duckdb.sql(
        f"SELECT n, d, ({g}) AS g, ({nn}) AS nn FROM (VALUES {vals}) t(n, d)"
    ).fetchall()
    for n, d, got_g, got_nn in rows:
        want = _ref(n, d)
        assert got_g == want, (n, d, got_g, want)
        assert got_nn == abs(want), (n, d, got_nn, want)


def test_motivating_divergence_case():
    """The class that actually fired: a ratio landing exactly on a 6dp
    half-boundary (e.g. -2.0747055) must round away from zero — the
    one convention, on both engines."""
    # -2074705500 / 1000 micro-units = -2074705.5 -> -2074706
    assert _ref(-2074705500, 1000) == -2074706
    got = duckdb.sql(
        f"SELECT {half_up_ratio_sql('-2074705500', '1000')}"
    ).fetchone()[0]
    assert got == -2074706
