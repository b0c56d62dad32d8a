"""Randomized differential fuzz gate: seeded corpora → full oracle sweep.

The edge gate (tools/edge_gate.py) runs three CURATED degenerate
corpora; this gate complements it with GENERATED ones. Per seed it
synthesizes fresh `documents` / `embeddings` / `events` tables — the
three tables every custom operator reads — mixing the hazards the
curated corpora plant by hand (NULL/empty/whitespace/multi-byte/giant
texts, exact+near duplicates, NULL lang/source, zero AND duplicate
vectors — exact score ties through every top-k tie-break, plus a HUB
vector class bigger than any catalog k so the tie group straddles the
top-k/shortlist/rerank cut itself — NULL timestamps, timestamp ties,
malformed JSON, negative values) in random
proportions and combinations, then runs the FULL 125-query cross-engine comparison
(tools/check_oracle.py) over the result. Different seeds exercise
different boundary combinations the hand-written corpora can't
enumerate: duplicate classes of random size and shape, hash/band
collisions under random shingle overlap, tie-break stacks, skewed
user histories, rounding numerators landing near half-boundaries.
(Equal-fetched_at duplicate-URL hazards ride along automatically: the
curation queries synthesize their WARC shard from `documents`, and
every 3rd page's two spellings fetch at the same second — see
plans/curation_queries.py _synth_warc — so every fuzz corpus exercises
the raw-url keep-rule tiebreak too.)

Everything is deterministic per seed (pinned by
tests/test_fuzz_gate.py), so a failing seed is a reproducible bug
report: `python tools/fuzz_gate.py <seed>`.

Usage: python tools/fuzz_gate.py [seed ...]        (default: 101 102 103)
Static TPC-H tables are copied from sf0.001. Exits non-zero if any
seed's sweep has any cross-engine mismatch. Record runs in NOTES.md.
"""

from __future__ import annotations

import os
import random
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001"
WORK = "/tmp/fuzz_gate"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# same register the testdata generator draws from, plus a few rarer
# tokens so document-frequency tails exist
VOCAB = (
    "the stream query row small group line fast spark customer batch data "
    "sort hash dup filter value big order column a vector key table scan "
    "merge part window join slow agg index shard probe flush spill codec"
).split()

LANGS = ["en", "de", "zh", "fr", "es"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
UNICODE_SNIPPETS = [
    "café naïve über",
    "中文文档 数据 引擎",
    "données triées vite",
    "schnelle zeilen",
    "emoji \U0001f600 tail",  # non-BMP: UTF-16 surrogate pair on the JVM
    "combining é mark",
]


def _word_salad(rng: random.Random, lo: int, hi: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(lo, hi)))


def gen_documents(rng: random.Random, n: int = 300):
    rows: list[tuple] = []
    texts: list[str] = []  # non-degenerate texts, for dup/near-dup draws
    for i in range(n):
        r = rng.random()
        if r < 0.03:
            text: str | None = None
        elif r < 0.06:
            text = ""
        elif r < 0.09:
            text = rng.choice([" ", "   ", "\t\n  \n", "\n\n\n"])
        elif r < 0.17 and texts:  # exact duplicate of an earlier doc
            text = rng.choice(texts)
        elif r < 0.27 and texts:  # near-duplicate: one-char edit
            src = rng.choice(texts)
            pos = rng.randrange(len(src))
            text = src[:pos] + rng.choice("qzx ") + src[pos + 1 :]
        elif r < 0.35:  # multi-byte / non-BMP mixed in
            text = _word_salad(rng, 3, 12) + " " + rng.choice(UNICODE_SNIPPETS)
        elif r < 0.38:  # giant doc (repeat amplifies shingle counts)
            text = (_word_salad(rng, 4, 8) + " ") * rng.randint(200, 600)
        elif r < 0.41:  # punctuation / PII-shaped tokens
            text = (
                _word_salad(rng, 3, 8)
                + rng.choice(
                    [
                        " a@b.co 10.0.0.1",
                        " +1 555-000-1111, ok?",
                        " (parens) [brackets] {braces}!",
                        " end.",
                    ]
                )
            )
        else:
            text = _word_salad(rng, 4, 40)
        if text and text.strip():
            texts.append(text)
        lang = None if rng.random() < 0.02 else rng.choice(LANGS)
        source = None if rng.random() < 0.02 else f"src{i}"
        rows.append((i, text, lang, source, len(text or "")))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def gen_embeddings(rng: random.Random, n: int = 300):
    # hub vector: ONE class repeated often enough (~5% of rows) that its
    # exact-score tie group straddles every top-k / shortlist / rerank
    # cut in the catalog (k <= 10) — pairwise duplicate ties alone never
    # land ON the cut boundary (VERDICT r8 #7, the rerank cut point)
    hub = [rng.gauss(0.0, 0.15) for _ in range(64)]
    vecs, labels = [], []
    for _ in range(n):
        r = rng.random()
        if r < 0.02:  # zero vector (normalize guard, NULL cosine)
            v = [0.0] * 64
        elif r < 0.05:  # large magnitudes
            v = [rng.uniform(-1e5, 1e5) for _ in range(64)]
        elif r < 0.08:  # tiny magnitudes
            v = [rng.uniform(-1e-6, 1e-6) for _ in range(64)]
        elif r < 0.13:  # hub member: the cut-straddling tie class
            v = list(hub)
        elif r < 0.19 and vecs:  # exact duplicate vector: score ties
            v = list(rng.choice(vecs))  # (top-k/ANN id tie-breaks)
        else:
            v = [rng.gauss(0.0, 0.15) for _ in range(64)]
        vecs.append(v)
        labels.append(rng.randrange(10))
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def gen_events(rng: random.Random, n: int = 800):
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC, microseconds
    # zipf-ish user pool: a few hot users + a long tail
    users = [1, 1, 1, 2, 2, 3] + list(range(4, 60))
    rows = []
    last_ts: dict[int, int] = {}
    for i in range(n):
        uid = rng.choice(users)
        r = rng.random()
        if r < 0.03:
            ts = None
        elif r < 0.10 and uid in last_ts:  # exact-tie with an earlier event
            ts = last_ts[uid]
        else:
            ts = base_us + rng.randrange(0, 30 * 24 * 3600) * 1_000_000
        if ts is not None:
            last_ts[uid] = ts
        value = (
            None
            if rng.random() < 0.05
            else round(rng.uniform(-50.0, 500.0), 2)
        )
        pr = rng.random()
        if pr < 0.10:
            props: str | None = None
        elif pr < 0.15:
            props = "{not json"
        elif pr < 0.25:
            props = '{"k": "notanumber"}'
        elif pr < 0.30:
            props = '{"k": {"nested": true}}'
        else:
            props = '{"k": %d}' % rng.randrange(100)
        rows.append((i, ts, uid, rng.choice(EVENT_TYPES), value, props))
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def build_corpus(seed: int) -> str:
    d = os.path.join(WORK, f"seed{seed}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for t in TABLES:
        if t not in ("documents", "embeddings", "events"):
            shutil.copy(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")
    rng = random.Random(seed)
    pq.write_table(gen_documents(rng), f"{d}/documents.parquet")
    pq.write_table(gen_embeddings(rng), f"{d}/embeddings.parquet")
    pq.write_table(gen_events(rng), f"{d}/events.parquet")
    return d


def main() -> int:
    seeds = [int(a) for a in sys.argv[1:]] or [101, 102, 103]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    failures = 0
    for seed in seeds:
        d = build_corpus(seed)
        print(f"=== fuzz corpus: seed {seed} ({d})")
        rc = subprocess.run(
            [sys.executable, "tools/check_oracle.py", d], cwd=repo
        ).returncode
        if rc != 0:
            failures += 1
    print(f"\n{failures} seeds with mismatches")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
