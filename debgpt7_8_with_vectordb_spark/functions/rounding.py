"""Exact cross-engine rounding for integer RATIOS.

``round(p / q, 6)`` on doubles is the one rounding convention that is
NOT safe cross-engine when p and q are integers: the true value can
land EXACTLY on a half-boundary at the 6th decimal (q dividing
2·10⁶·p is not measure-zero the way a transcendental score landing
there is), and at a boundary Spark's round (BigDecimal HALF_UP on the
double's shortest decimal repr) and DuckDB's (float-space) can differ
by one ulp in the last digit. Found by the round-5 sf0.1 sweep: both
quality classifiers' ``logit`` (weight-sum / token-count) each
mismatched on exactly one row.

The fix: compute the scaled rounding ENTIRELY in integer arithmetic,
with one explicit convention (round half AWAY FROM ZERO), identically
on both engines. Everything here uses only abs / %% / exact division
of an exactly-divisible pair — engine-portable operations.

For transcendental scores (ln, exp, cosine) the ordinary
``round(x, 6)`` stays fine: identical doubles in, boundary hits
measure-zero. Use this module only where the rounded value is a ratio
of integers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def half_up_ratio(num: Column, den: Column) -> Column:
    """round-half-away-from-zero(num/den) as a LONG, exact.

    ``num``/``den`` must be integral columns with den > 0 and
    |num| < 2^53 (exactness of the (a - a%%den)/den double division
    relies on the quotient being an exactly-representable integer).
    """
    a = F.abs(num)
    r = a % den
    # a - r is exactly divisible by den and the quotient is an integer
    # < 2^53, so the IEEE division result is exact
    q0 = ((a - r) / den).cast("long")
    q = q0 + F.when(2 * r >= den, F.lit(1)).otherwise(F.lit(0))
    return F.when(num < 0, -q).otherwise(q)


def half_up_ratio_nonneg(num: Column, den: Column) -> Column:
    """``half_up_ratio`` for num >= 0, den > 0 — as the SINGLE-REFERENCE
    formula floor((2·num + den) / (2·den)).

    Why it exists: the general helper references ``num`` four times, and
    when num is an expensive per-row expression (array_intersect in the
    jaccard pair space) Catalyst inlines it at every reference — a
    measured 5× slowdown on dedup_ngram_jaccard. Here num appears once.

    Exactness: the true quotient's distance to any integer is >=
    1/(2·den), far above double ulp for |2·num + den| < 2^53 (same
    precondition class as the general helper), so the IEEE division
    cannot cross an integer and floor is exact. Ties (x.5) round UP,
    which for non-negative ratios is identical to half-away-from-zero.
    """
    return F.floor(
        (2 * num + den).cast("double") / (2 * den).cast("double")
    ).cast("long")


def half_up_ratio_nonneg_sql(num: str, den: str) -> str:
    """DuckDB twin of ``half_up_ratio_nonneg`` (num >= 0, den > 0)."""
    return f"floor((2 * {num} + {den}) / (2.0 * ({den})))::BIGINT"


def half_up_ratio_sql(num: str, den: str) -> str:
    """The identical computation as a DuckDB SQL fragment.

    ``num``/``den`` are SQL expressions (referenced multiple times —
    pass column NAMES or cheap expressions, or bind them in a CTE
    first). DuckDB ``//`` is exact on the exactly-divisible pair for
    the same reason as above.
    """
    return (
        f"(CASE WHEN {num} < 0 THEN -1 ELSE 1 END) * "
        f"(((abs({num}) - abs({num}) % {den}) // {den}) + "
        f"(CASE WHEN 2 * (abs({num}) % {den}) >= {den} THEN 1 ELSE 0 END))"
    )
