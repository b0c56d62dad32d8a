"""Property-based tests (hypothesis) for the pure-function operators.

These are driver-side properties of the per-document functions the Spark
operators wrap (`chunk_text`, `pack_sizes`, `hash_embed_py`) — the Spark
side is pinned by the catalog oracles; here hypothesis hammers the
algorithmic invariants the reference's semantics demand (SURVEY §7.7
risk 1: utf-8 edge cases in byte-size chunking).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from debgpt7_8_with_vectordb_spark.operators.binpack import pack_sizes
from debgpt7_8_with_vectordb_spark.operators.chunker import chunk_spans, chunk_text
from debgpt7_8_with_vectordb_spark.operators.embedding import hash_embed_py

# text incl. multi-byte chars (utf-8 sizes ≠ char counts) and newlines
texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\r"),
    max_size=400,
)


@given(texts, st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_chunker_partition_roundtrip(text, max_bytes):
    """Chunks cover the line axis exactly once, in order, and rejoin to
    the original text."""
    rows = chunk_text(text, max_bytes)
    lines = text.split("\n")
    # contiguous cover of [0, n)
    spans = [(s, e) for (s, e, _nb, _c) in rows]
    assert spans[0][0] == 0 and spans[-1][1] == len(lines)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2
    # rejoin identity (the chunk boundary IS a line boundary)
    assert "\n".join(c for (_s, _e, _nb, c) in rows) == text


@given(texts, st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_chunker_size_bound_or_single_line(text, max_bytes):
    """Every chunk fits the byte budget OR is a single (over-long) line —
    the reference's termination guard (reader.py:1035-1115)."""
    for s, e, n_bytes, content in chunk_text(text, max_bytes):
        assert n_bytes == len(content.encode("utf-8"))
        assert n_bytes <= max_bytes or (e - s) == 1


@given(st.lists(st.text(max_size=20), min_size=1, max_size=50), st.integers(1, 100))
@settings(max_examples=100, deadline=None)
def test_chunk_spans_deterministic(lines, max_bytes):
    assert chunk_spans(lines, max_bytes) == chunk_spans(lines, max_bytes)


@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=2),
)
@settings(max_examples=200, deadline=None)
def test_pack_sizes_invariants(sizes, max_group, min_per_group):
    """First-fit packing: group ids are a non-decreasing 0..k sequence
    (order-dependent — C3); byte budget respected except where the
    min-per-group rule (C4) or a single oversized item forces overflow."""
    gids = pack_sizes(sizes, max_group, min_per_group)
    assert len(gids) == len(sizes)
    assert gids[0] == 0
    for a, b in zip(gids, gids[1:]):
        assert b in (a, a + 1)  # sequential first-fit, no reordering

    groups: dict[int, list[int]] = {}
    for sz, g in zip(sizes, gids):
        groups.setdefault(g, []).append(sz)
    for g, members in groups.items():
        over_budget = sum(members) > max_group
        if over_budget:
            # only a forced min-fill or a single big item may overflow
            assert len(members) <= max(min_per_group, 1)
    if min_per_group == 2 and len(sizes) >= 2:
        # convergence guarantee (reference mapreduce.py:308-326): every
        # CLOSED group has >=2 members; only the trailing group may be a
        # singleton (the reference's final flush appends it as-is)
        last_gid = max(groups)
        assert all(len(m) >= 2 for g, m in groups.items() if g != last_gid)


@given(st.text(max_size=100), st.integers(min_value=1, max_value=32))
@settings(max_examples=100, deadline=None)
def test_hash_embedding_unit_norm_and_determinism(text, dim):
    v1 = hash_embed_py(text, dim)
    v2 = hash_embed_py(text, dim)
    assert v1 == v2
    assert len(v1) == dim
    n = sum(x * x for x in v1)
    assert abs(n - 1.0) < 1e-9 or n == 0.0


def _reference_chunk_spans(lines, max_bytes, start, end):
    """Independent reimplementation of the reference's recursion
    (reader.py:1035-1071: size check first, then the single-line
    termination guard, midpoint (start+end)//2) for golden comparison."""
    size = len("\n".join(lines[start:end]).encode("utf8"))
    if size <= max_bytes or end - start == 1:
        return {(start, end)}
    middle = (start + end) // 2
    return _reference_chunk_spans(lines, max_bytes, start, middle) | _reference_chunk_spans(
        lines, max_bytes, middle, end
    )


@given(texts, st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_chunker_golden_parity_with_reference_algorithm(text, max_bytes):
    """Split points must be IDENTICAL to the reference's bisection so
    chunk keys (start, end) hash-match golden outputs (SURVEY §4.3.3)."""
    lines = text.split("\n")
    ours = set(chunk_spans(lines, max_bytes))
    theirs = _reference_chunk_spans(lines, max_bytes, 0, len(lines))
    assert ours == theirs


@given(
    st.lists(st.integers(min_value=0, max_value=600), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=500),
)
@settings(max_examples=60, deadline=None)
def test_duckdb_pack_fold_matches_pack_sizes(sizes, budget):
    """The mapreduce_echo_compact oracle replays the greedy min-2 packing
    with a DuckDB list_reduce fold; this pins that fold's EXACT
    equivalence to operators/binpack.pack_sizes on arbitrary inputs
    (group sums after combine = member sum + count - 1 separators)."""
    import duckdb

    from debgpt7_8_with_vectordb_spark.operators.binpack import pack_sizes

    gids = pack_sizes(sizes, budget, min_per_group=2)
    expected = []
    lo = 0
    for hi in range(1, len(gids) + 1):
        if hi == len(gids) or gids[hi] != gids[lo]:
            expected.append(sum(sizes[lo:hi]) + (hi - lo) - 1)
            lo = hi

    lst = "[" + ",".join(f"{s}::BIGINT" for s in sizes) + "]"
    q = f"""
    SELECT st[1:len(st)-2] || [st[-2] + st[-1] - 1]
    FROM (SELECT list_reduce(
      list_prepend([0::BIGINT, 0::BIGINT], list_transform({lst}, s -> [s])),
      (a, x) -> CASE
        WHEN a[-1] > 0 AND a[-2] + x[1] > {budget} AND a[-1] >= 2
        THEN a[1:len(a)-2] || [a[-2] + a[-1] - 1, x[1], 1::BIGINT]
        ELSE a[1:len(a)-2] || [a[-2] + x[1], a[-1] + 1]
      END) AS st) t
    """
    got = list(duckdb.sql(q).fetchone()[0])
    assert got == expected, (sizes, budget)
