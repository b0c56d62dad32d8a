"""Chunker + bin-packing unit tests.

Golden identities mirror the reference's own expectations
(tests/test_reader.py:27-35: 5 one-char lines @ max 2 bytes → 5 chunks;
tests/test_mapreduce.py:137-142: 26 one-char strings @ max 2 → 13 groups).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from debgpt7_8_with_vectordb_spark.operators.binpack import pack_sizes
from debgpt7_8_with_vectordb_spark.operators.chunker import (
    _span_bytes,
    chunk_documents,
    chunk_spans,
    chunk_text,
)


def test_five_tiny_lines_five_chunks():
    # 5 one-char lines @ max_chunk_size=2 → exactly 5 chunks
    spans = chunk_spans(["a", "b", "c", "d", "e"], max_bytes=2)
    assert spans == [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]


def test_single_doc_fits():
    spans = chunk_spans(["hello", "world"], max_bytes=100)
    assert spans == [(0, 2)]


def test_single_overlong_line_is_own_chunk():
    # termination guard: a line bigger than max still becomes one chunk
    spans = chunk_spans(["x" * 100, "y"], max_bytes=10)
    assert (0, 1) in spans
    assert spans == [(0, 1), (1, 2)]


def test_empty_text():
    assert chunk_spans([], 10) == []
    assert chunk_text("", 10) == [(0, 1, 0, "")]  # '' splits to ['']


def test_spans_partition_the_document():
    lines = [f"line-{i}" * (i % 7) for i in range(100)]
    spans = chunk_spans(lines, max_bytes=50)
    assert spans[0][0] == 0
    assert spans[-1][1] == len(lines)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2  # contiguous, no overlap, no gap


def test_multibyte_utf8_sizes_in_octets():
    # 'é' is 2 UTF-8 bytes: 3 such chars + 2 joiners = 8 bytes > 7 → split
    lines = ["é", "é", "é"]
    assert _span_bytes(lines, 0, 3) == 8
    spans = chunk_spans(lines, max_bytes=7)
    assert len(spans) > 1


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.text(alphabet="abÉ🎉 ", max_size=20), max_size=40),
    st.integers(min_value=1, max_value=64),
)
def test_chunker_invariants(lines, max_bytes):
    spans = chunk_spans(lines, max_bytes)
    # partition property
    if lines:
        assert spans[0][0] == 0 and spans[-1][1] == len(lines)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2
    # every multi-line span fits the budget
    for s, e in spans:
        if e - s > 1:
            assert _span_bytes(lines, s, e) <= max_bytes


def test_binpack_26_singles_max2_gives_13_pairs():
    # 26 1-byte items @ max 2 → 13 groups of exactly 2
    gids = pack_sizes([1] * 26, max_group_bytes=2)
    assert gids == [i // 2 for i in range(26)]


def test_binpack_min_per_group_two_forces_progress():
    # reduce-side variant: even if 2 items overflow, group keeps ≥2
    gids = pack_sizes([100, 100, 100, 100], max_group_bytes=10, min_per_group=2)
    assert gids == [0, 0, 1, 1]


def test_binpack_reset_not_cumsum():
    # the accumulator RESETS at a boundary — distinguishes first-fit from
    # a plain cumulative-sum bucketing
    gids = pack_sizes([6, 6, 6], max_group_bytes=10)
    assert gids == [0, 1, 2]


def test_chunk_documents_distributed(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb\nc\nd\ne"), (2, "hello"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_bytes=2).orderBy("doc_id", "start").collect()
    d1 = [r for r in out if r["doc_id"] == 1]
    assert [(r["start"], r["end"]) for r in d1] == [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["content"] == "hello"
