"""Cross-document packing vs a global greedy scan (VERDICT r3 next #6).

The distributed operator packs per fixed-width doc-id range; the
single-threaded ideal packs the same chunk stream in one global scan.
The contract: per-range packing replays the greedy scan EXACTLY inside
each range, and the only divergence from the global scan is at range
boundaries (the accumulator resets), so the group count exceeds the
global count by at most one group per non-empty range.
"""

from __future__ import annotations

import pytest

from debgpt7_8_with_vectordb_spark.operators.binpack import (
    pack_chunks_crossdoc,
    pack_sizes,
)

MAX_GROUP = 400
WIDTH = 8


@pytest.fixture(scope="module")
def chunks(spark):
    # deterministic synthetic chunk table: 40 docs, variable chunk
    # counts/sizes, including docs far smaller than a group
    rows = []
    for d in range(40):
        n = 1 + (d * 7) % 5
        for c in range(n):
            rows.append((d, c * 10, 17 + ((d * 31 + c * 13) % 220)))
    return spark.createDataFrame(rows, "doc_id long, start int, n_bytes long")


def test_per_range_packing_replays_greedy_exactly(chunks):
    packed = pack_chunks_crossdoc(chunks, MAX_GROUP, WIDTH).collect()
    raw = sorted(chunks.collect(), key=lambda r: (r["doc_id"], r["start"]))
    by_range: dict[int, list] = {}
    for r in raw:
        by_range.setdefault(r["doc_id"] // WIDTH, []).append(r)
    for rid, rows in by_range.items():
        gids = pack_sizes([r["n_bytes"] for r in rows], MAX_GROUP)
        expect: dict[int, dict] = {}
        for g, row in zip(gids, rows):
            e = expect.setdefault(
                g, {"n_items": 0, "group_bytes": 0, "docs": set()}
            )
            e["n_items"] += 1
            e["group_bytes"] += row["n_bytes"]
            e["docs"].add(row["doc_id"])
        got = {p["group_id"]: p for p in packed if p["range_id"] == rid}
        assert set(got) == set(expect), f"range {rid}: group ids differ"
        for g, e in expect.items():
            assert got[g]["n_items"] == e["n_items"]
            assert got[g]["group_bytes"] == e["group_bytes"]
            assert got[g]["n_docs"] == len(e["docs"])
            assert got[g]["first_doc"] == min(e["docs"])
            assert got[g]["last_doc"] == max(e["docs"])


def test_group_count_within_boundary_bound_of_global_scan(chunks):
    packed = pack_chunks_crossdoc(chunks, MAX_GROUP, WIDTH).collect()
    raw = sorted(chunks.collect(), key=lambda r: (r["doc_id"], r["start"]))
    n_global = len(set(pack_sizes([r["n_bytes"] for r in raw], MAX_GROUP)))
    n_ranges = len({r["doc_id"] // WIDTH for r in raw})
    n_dist = len(packed)
    assert n_global <= n_dist <= n_global + n_ranges, (
        f"distributed {n_dist} groups vs global {n_global} with "
        f"{n_ranges} ranges — boundary bound violated"
    )


def test_no_group_overflows_unless_singleton(chunks):
    for p in pack_chunks_crossdoc(chunks, MAX_GROUP, WIDTH).collect():
        assert p["group_bytes"] <= MAX_GROUP or p["n_items"] == 1


def test_cross_document_packing_actually_crosses(chunks):
    """The point of the variant: at least one group holds chunks from
    more than one document (per-doc packing can never produce this)."""
    packed = pack_chunks_crossdoc(chunks, MAX_GROUP, WIDTH).collect()
    assert any(p["n_docs"] > 1 for p in packed)
