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

    The |num| < 2^53 precondition is CALLER-GUARANTEED, and int64
    arithmetic wraps silently past 2^63 — so this helper (and its
    *_nonneg / *_sql twins) is only for PER-ROW-BOUNDED numerators:
    counts within one document, one pair, one group member (a doc's
    chars, tokens, or fingerprints never approach 9e9, so count·10^6
    stays exact). For numerators that AGGREGATE over a corpus or
    group — sum(n_chars), sum(hit), per-domain token totals — the
    bound is exceeded well inside the 100 TB design scale; use
    ``half_up_scaled_ratio`` below, which has no 2^53/int64 bound.
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


_DEC = "decimal(38,0)"


def half_up_scaled_ratio(
    num: Column, den: Column, scale: int = 1_000_000
) -> Column:
    """round-half-away-from-zero(num·scale / den) as a LONG — the
    AGGREGATE-numerator variant, with NO 2^53 / int64 bound.

    The long-based helpers above require |num| < 2^53 and wrap
    silently past int64; corpus-scale sums (sum(n_chars)·10^6 past
    ~4.5e9 chars) exceed both inside the claimed 100 TB scale, and on
    overflow DuckDB raises while non-ANSI Spark wraps — the engines
    would diverge exactly where exactness matters most. Here every
    step is decimal(38,0) (int128-class, mirroring DuckDB's HUGEINT):

    - ``num·scale`` is exact to 10^38 (num may be an un-pre-scaled
      integral sum, or an integral-VALUED decimal such as a
      DECIMAL(·,6) error sum already multiplied by 10^6 — cast to
      scale 0 is exact for integral values — with ``scale=1``);
    - the divide is the exactly-divisible (a - a%den)/den pair, whose
      integer quotient Spark represents exactly in DECIMAL(38,6) for
      quotients < 10^32;
    - the final cast to long RAISES (Spark CAST_OVERFLOW) on a result
      past 2^63, exactly where DuckDB's HUGEINT→BIGINT cast raises —
      identical loud failure, never silent divergence.

    Sign convention is half-AWAY-FROM-ZERO (the module's single
    convention), correct for signed numerators (e.g. an hourly sum of
    signed values) — unlike ``half_up_ratio_nonneg``, whose
    num >= 0 precondition rounds negatives half-toward-+inf.
    den > 0 required. Per-group cost: a handful of decimal ops —
    negligible on aggregate rows; for per-row hot paths keep the long
    helpers (decimal arithmetic is not codegen-primitive).
    """
    nd = num.cast(_DEC) * F.lit(scale).cast(_DEC)
    dd = den.cast(_DEC)
    a = F.abs(nd)
    r = a % dd
    # a - r is exactly divisible by dd; the decimal quotient is the
    # exact integer (representable at scale 6 for quotients < 10^32)
    q0 = ((a - r) / dd).cast("long")
    q = q0 + F.when(F.lit(2).cast(_DEC) * r >= dd, F.lit(1)).otherwise(
        F.lit(0)
    )
    return F.when(nd < 0, -q).otherwise(q)


def half_up_scaled_ratio_sql(num: str, den: str, scale: int = 1_000_000) -> str:
    """DuckDB twin of ``half_up_scaled_ratio``: HUGEINT (int128)
    end-to-end. ``//`` on non-negative HUGEINTs is the exact
    (a - a%d)/d quotient; the final ::BIGINT raises out-of-range
    exactly like Spark's long cast. ``num``/``den`` are referenced
    multiple times — pass aggregate expressions (computed once per
    group) or cheap columns."""
    n = f"(({num})::HUGEINT * {scale})"
    d = f"(({den})::HUGEINT)"
    return (
        f"((CASE WHEN {n} < 0 THEN -1 ELSE 1 END) * "
        f"((abs({n}) // {d}) + "
        f"(CASE WHEN 2 * (abs({n}) % {d}) >= {d} THEN 1 ELSE 0 END)))::BIGINT"
    )
