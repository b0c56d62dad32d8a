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
    half_up_scaled_ratio,
    half_up_scaled_ratio_sql,
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


def _scaled_ref(n: int, d: int, scale: int) -> int:
    return _ref(n * scale, d)


def _scaled_cases() -> list[tuple[int, int]]:
    """Numerators BEYOND the long helpers' 2^53 bound (the ADVICE-r5
    class: corpus-scale sums where num*1e6 exceeds 2^53 / int64), plus
    signed values, ties, and small sanity points."""
    rng = random.Random(7)
    cases = [
        (2**53 + 1, 4_500_000_001),          # just past the double-exact bound
        (123_456_789_012_345_678, 9_000_000_000),
        (-123_456_789_012_345_678, 9_000_000_000),
        (10**17 + 7, 3),                      # sum*1e6 far past int64
        (-(10**17 + 7), 3),
        (3, 2), (-3, 2), (1, 3), (2, 3), (0, 5),
    ]
    # exact .5 ties at scale: n*1e6/d == x.5  <=>  2*n*1e6 = (2x+1)*d
    for d in (4_000_000, 16_000_000):
        cases.append((d // 2_000_000 * 10**12 + d // 2_000_000, d))
    cases += [
        (rng.randrange(-(2**60), 2**60), rng.randrange(1, 10**10))
        for _ in range(200)
    ]
    # keep results representable in a long (micro-units)
    return [(n, d) for n, d in cases if abs(_scaled_ref(n, d, 10**6)) < 2**62]


def test_scaled_spark_matches_reference_beyond_2_53(spark):
    cases = _scaled_cases()
    df = spark.createDataFrame(cases, "n long, d long")
    rows = df.select(
        "n",
        "d",
        half_up_scaled_ratio(F.col("n"), F.col("d")).alias("s"),
        half_up_scaled_ratio(F.col("n"), F.col("d"), scale=100).alias("s100"),
    ).collect()
    for r in rows:
        assert r["s"] == _scaled_ref(r["n"], r["d"], 10**6), (r["n"], r["d"])
        assert r["s100"] == _scaled_ref(r["n"], r["d"], 100), (r["n"], r["d"])


def test_scaled_duckdb_matches_reference_beyond_2_53():
    cases = _scaled_cases()
    vals = ",".join(f"({n}::BIGINT,{d}::BIGINT)" for n, d in cases)
    s = half_up_scaled_ratio_sql("n", "d")
    s100 = half_up_scaled_ratio_sql("n", "d", scale=100)
    rows = duckdb.sql(
        f"SELECT n, d, ({s}) AS s, ({s100}) AS s100 FROM (VALUES {vals}) t(n, d)"
    ).fetchall()
    for n, d, got, got100 in rows:
        assert got == _scaled_ref(n, d, 10**6), (n, d, got)
        assert got100 == _scaled_ref(n, d, 100), (n, d, got100)


def test_scaled_accepts_integral_valued_decimal(spark):
    """The minhash-mae shape: a DECIMAL(·,6) error sum pre-multiplied by
    1e6 (integral value, fractional TYPE) with scale=1 — the decimal
    (38,0) cast must be exact, on both engines."""
    df = spark.createDataFrame(
        [("123.456789",), ("0.000001",), ("99999999.999999",)],
        "e string",
    ).select(F.col("e").cast("decimal(24,6)").alias("e"))
    rows = df.select(
        half_up_scaled_ratio(
            F.col("e") * F.lit(1_000_000), F.lit(7).cast("long"), scale=1
        ).alias("u")
    ).collect()
    want = [_ref(123456789, 7), _ref(1, 7), _ref(99999999999999, 7)]
    assert sorted(r["u"] for r in rows) == sorted(want)
    frag = half_up_scaled_ratio_sql("(e * 1000000)", "7", scale=1)
    duck = duckdb.sql(
        f"SELECT ({frag}) AS u FROM (VALUES ('123.456789'::DECIMAL(24,6)),"
        f"('0.000001'::DECIMAL(24,6)),('99999999.999999'::DECIMAL(24,6))) t(e)"
    ).fetchall()
    assert sorted(int(r[0]) for r in duck) == sorted(want)


def test_scaled_negative_rounds_away_from_zero():
    """The hypertable class ADVICE r5 flagged: a NEGATIVE sum fed to the
    nonneg formula rounds half-toward-+inf; the scaled helper must keep
    the module's half-away-from-zero convention. -7/2 scale=1 = -3.5
    -> -4 (nonneg formula would give -3)."""
    assert _scaled_ref(-7, 2, 1) == -4
    got = duckdb.sql(
        f"SELECT {half_up_scaled_ratio_sql('-7', '2', scale=1)}"
    ).fetchone()[0]
    assert got == -4


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
