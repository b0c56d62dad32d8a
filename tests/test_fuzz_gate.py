"""The fuzz gate's corpora must be deterministic per seed — a failing
seed has to be a reproducible bug report (tools/fuzz_gate.py docstring).
No Spark needed: this pins the generators only; the sweep itself is the
tool's job."""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools import fuzz_gate  # noqa: E402


def _tables(seed: int):
    rng = random.Random(seed)
    return (
        fuzz_gate.gen_documents(rng),
        fuzz_gate.gen_embeddings(rng),
        fuzz_gate.gen_events(rng),
    )


def test_same_seed_same_bytes():
    a = _tables(101)
    b = _tables(101)
    for ta, tb in zip(a, b):
        assert ta.equals(tb)


def test_different_seed_different_corpus():
    a = _tables(101)
    b = _tables(102)
    assert not a[0].equals(b[0])


def test_hazards_present():
    """Every hazard class the docstring promises actually occurs for the
    default seeds (a silent probability-drift would hollow the gate)."""
    for seed in (101, 102, 103):
        docs, emb, ev = _tables(seed)
        texts = docs.column("text").to_pylist()
        assert any(t is None for t in texts)
        assert any(t == "" for t in texts)
        assert any(t is not None and t != "" and not t.strip() for t in texts)
        non_null = [t for t in texts if t]
        assert len(set(non_null)) < len(non_null)  # exact dups
        assert any(len(t) > 5000 for t in non_null)  # giant docs
        assert any(ord(c) > 0xFFFF for t in non_null for c in t)  # non-BMP
        langs = docs.column("lang").to_pylist()
        assert any(lg is None for lg in langs)
        vecs = emb.column("embedding").to_pylist()
        assert any(all(x == 0.0 for x in v) for v in vecs)  # zero vector
        keyed = [tuple(v) for v in vecs]
        assert len(set(keyed)) < len(keyed)  # duplicate vectors (ties)
        # the hub tie class must straddle every catalog top-k cut
        # (k <= 10): one exact-score group larger than k
        from collections import Counter

        assert max(Counter(keyed).values()) > 10
        ts = ev.column("ts").to_pylist()
        assert any(t is None for t in ts)
        seen = [t for t in ts if t is not None]
        assert len(set(seen)) < len(seen)  # timestamp ties
        props = ev.column("props").to_pylist()
        assert "{not json" in props
        vals = ev.column("value").to_pylist()
        assert any(v is None for v in vals)
        assert any(v is not None and v < 0 for v in vals)


def test_schema_matches_testdata():
    import pyarrow.parquet as pq

    docs, emb, ev = _tables(101)
    import pyarrow as pa

    for name, tbl in (("documents", docs), ("embeddings", emb)):
        ref = pq.read_schema(f"{fuzz_gate.BASE}/{name}.parquet")
        assert tbl.schema.names == ref.names
        for got, want in zip(tbl.schema.types, ref.types):
            if pa.types.is_list(want):  # list field-name differs; value type must not
                assert pa.types.is_list(got) and got.value_type == want.value_type
            else:
                assert got == want
    # events: the reference parquet stores NANOS timestamps; the fuzz
    # writer (like the edge gate's DuckDB writer) uses MICROS by design
    # — readers must handle both. Names and non-ts types still match.
    ref = pq.read_schema(f"{fuzz_gate.BASE}/events.parquet")
    assert ev.schema.names == ref.names
