"""Text column functions for the analytics / dedup operators.

All pure Catalyst expressions (split / transform / filter / sequence) —
no Python UDFs in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: tiny fixed stopword list used by quality scoring & language-ID
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def char_shingles(text: Column, n: int = 5) -> Column:
    """All character n-grams of ``text`` (at least one, for short texts)."""
    positions = F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1)))
    return F.transform(positions, lambda i: text.substr(i, F.lit(n)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """All word n-grams as strings (for MinHash over shingles)."""
    toks = tokens(text)
    count = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
