"""Round-14 optimization internals.

Each optimization that changed an operator's internals gets a pinning
test here: the scale-adaptive fan_out gate, the vectorized simhash bit
votes (vs the retired per-bit fold semantics), and the explode-first
substring window builder (vs the retired interpreted-HOF shape).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from debgpt7_8_with_vectordb_spark.functions.hashing import md5_long
from debgpt7_8_with_vectordb_spark.functions.text import tokens, word_shingles
from debgpt7_8_with_vectordb_spark.plans.dedup_queries import (
    SUBSTR_WIN,
    _simhash_votes,
    _substring_windows,
)
from debgpt7_8_with_vectordb_spark.tables import fan_out


def test_fan_out_spreads_narrow_scans(spark):
    target = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    narrow = narrow.coalesce(1)
    spread = fan_out(narrow, "doc_id")
    assert spread.rdd.getNumPartitions() == target
    # rows unchanged (hash repartition only moves them)
    assert sorted(r[0] for r in spread.collect()) == list(range(100))


def test_fan_out_is_a_noop_at_scale(spark):
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target + 4)
    assert fan_out(wide, "id") is wide


def test_simhash_votes_match_bitfold_semantics(spark):
    # brute-force reference: per bit, vote = sum(+1 if bit set else -1),
    # bit set in the simhash iff vote > 0 — including the all-zero
    # cases (empty array, NULL array) and exact tie votes (bit NOT set)
    rows = [
        (1, [0b1011, 0b0011, 0b1000]),
        (2, []),
        (3, None),
        (4, [0b1, 0b1, 0b10, 0b10]),  # exact ties on bits 0 and 1
        (5, [(1 << 59) | 5]),  # top md5_long bit
    ]

    def ref(hs):
        if not hs:
            return 0
        out = 0
        for b in range(60):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if vote > 0:
                out |= 1 << b
        return out

    df = spark.createDataFrame(rows, "doc_id long, hs array<long>")
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", _simhash_votes(60)("hs").alias("sh")
        ).collect()
    }
    assert got == {i: ref(hs) for i, hs in rows}


def test_substring_windows_match_retired_hof_shape(spark, sf_dir):
    from debgpt7_8_with_vectordb_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    new = _substring_windows(docs)
    toks = tokens(F.col("text"))
    old_base = docs.filter(F.size(toks) >= SUBSTR_WIN).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.transform(
            word_shingles(F.col("text"), SUBSTR_WIN), md5_long
        ).alias("hs"),
    )
    old = old_base.select(
        "doc_id", "n_tokens", F.posexplode("hs").alias("pos0", "h")
    ).select("doc_id", "n_tokens", (F.col("pos0") + 1).alias("start"), "h")
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_interval_union_equals_distinct_position_count(spark):
    # the lag-window coverage rewrite: sum(min(W, gap)) over sorted
    # unique starts == |union of [start, start+W-1]| for every overlap
    # pattern (adjacent, overlapping, disjoint, single)
    import itertools

    W = SUBSTR_WIN
    for starts in [
        [1],
        [1, 2, 3],
        [1, 6],
        [1, 2, 10, 11, 30],
        [5, 5 + W, 5 + 2 * W],
        list(range(1, 20, 2)),
    ]:
        brute = len(
            set(itertools.chain.from_iterable(range(s, s + W) for s in starts))
        )
        ssorted = sorted(starts)
        formula = W + sum(
            min(W, b - a) for a, b in zip(ssorted, ssorted[1:])
        )
        assert formula == brute, starts
