"""Distributed connected components (duplicate-cluster canonicalization).

Min-label propagation PLUS pointer doubling: each round every node takes
the min of (its own label, its neighbors' labels), then JUMPS — replaces
its label with its label's label. Neighbor propagation alone needs
O(diameter) rounds (a 64-doc duplicate chain = 63 rounds); the jump
halves pointer depth every round, so chains converge in O(log diameter)
rounds with the same per-round primitives (two equi-joins + a min
groupBy — no new shuffle shapes, so the 100 TB story is unchanged).

Invariant: a node's label is always the id of some node in its own
component (labels start as self-ids and only move along edges or along
label pointers, both intra-component), and labels are monotone
non-increasing — so the exact decimal label-sum is a convergence
certificate, and the fixpoint (stable under neighbor-min ⇒ constant per
component; component min keeps itself) is the component-min labeling.

Reference has no equivalent (single-node SQLite client); this is pure
engine, same iterative shape as operators/mapreduce.py's reduce loops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Round cap — 2·log₂(n) + slack covers any graph pointer doubling can
#: see; the certificate loop normally exits far earlier (near-clique
#: duplicate classes: 1-2 rounds; planted 64-chain: ≤7, pinned in
#: tests/test_graph_components.py).
DEFAULT_MAX_ROUNDS = 30


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = DEFAULT_MAX_ROUNDS,
) -> tuple[DataFrame, int]:
    """Label every node with its component's min node id.

    ``nodes``: one column ``doc_id`` (long). ``edges``: columns
    ``src``/``dst`` (long), assumed SYMMETRIC (caller unions both
    directions). Returns (labels(doc_id, lab), rounds_run).
    """
    from .mapreduce import _checkpoint_rdd_id, _unpersist_rdds

    spark = edges.sparkSession
    sym = edges.select("src", "dst").localCheckpoint(eager=True)
    labels = nodes.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("doc_id").cast("long").alias("lab"),
    ).localCheckpoint(eager=True)
    prev_sum = None
    rounds = 0
    prev_ids: set[int] = set()
    for _ in range(max_rounds):
        # 1. neighbor-min: each node sees the labels across its edges
        nbr = sym.join(
            labels.withColumnRenamed("doc_id", "dst"), "dst"
        ).select(F.col("src").alias("doc_id"), "lab")
        cand = (
            labels.union(nbr)
            .groupBy("doc_id")
            .agg(F.min("lab").alias("lab"))
            # materialize BEFORE the self-join: cand appears twice in the
            # jump, and without this its lineage (the edges⋈labels join —
            # the round's expensive stage) would execute twice per round
            .localCheckpoint(eager=True)
        )
        # 2. pointer jump: lab ← label OF the label (labels are node ids,
        #    every node has a row, so this is a self-equi-join; min keeps
        #    monotonicity when the jump target hasn't caught up yet)
        jumped = cand.alias("c").join(
            cand.select(
                F.col("doc_id").alias("lab"), F.col("lab").alias("lab2")
            ).alias("j"),
            "lab",
        )
        labels = jumped.select(
            "doc_id", F.least("lab", "lab2").alias("lab")
        ).localCheckpoint(eager=True)
        rounds += 1
        # exact convergence: labels only decrease, so an unchanged
        # decimal (overflow-proof) sum means a fixpoint
        cur_sum = labels.agg(F.sum(F.col("lab").cast("decimal(38,0)"))).head()[0]
        # round r reads ONLY labels_{r-1}: once labels_r is materialized
        # (the sum action above), the previous round's checkpoint blocks
        # (old labels + its cand) are dead — free them deterministically
        # instead of carrying up to 2 x max_rounds block sets to JVM GC
        # (the mapreduce 100x-tile lesson; `sym` and the initial labels
        # predate the loop and are never touched). Ids are extracted
        # from the round's own DataFrames — exact, never a session diff
        _unpersist_rdds(spark, prev_ids)
        prev_ids = {
            _checkpoint_rdd_id(cand), _checkpoint_rdd_id(labels)
        } - {None}
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels, rounds
