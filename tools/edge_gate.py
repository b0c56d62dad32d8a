"""Edge-corpus robustness gate: build degenerate tables, run the oracle gate.

Three corpora, each a copy of sf0.001 with one table replaced by
adversarial rows, then the FULL cross-engine comparison
(tools/check_oracle.py) over each:

- documents: empty / NULL / whitespace / multi-byte / giant / duplicate
  texts (NULL-text contract, token-less semantics, division guards);
- embeddings: planted zero vectors (NULL cosine, rank-last ordering,
  normalize guard);
- events: standard-MICROS timestamps (vs the testdata's NANOS — writer
  portability), NULL value/props, malformed JSON, duplicate-ts ties.

Usage: python tools/edge_gate.py [base_sf_dir] [work_dir]
Exits non-zero if any corpus has any cross-engine mismatch.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import duckdb

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/edge_gate"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def corpus(name: str, replace_table: str, build_sql: str) -> str:
    d = os.path.join(WORK, name)
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t != replace_table:
            shutil.copy(f"{BASE}/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(build_sql.format(base=BASE, out=f"{d}/{replace_table}.parquet"))
    return d


DOCS_SQL = """
COPY (
  SELECT * FROM (VALUES
    (0::BIGINT, '', 'en', 'src0', 0::BIGINT),
    (1, NULL, 'en', 'src1', 0),
    (2, '   ', 'es', 'src2', 3),
    (3, e'\\t\\n  \\n', 'es', 'src3', 6),
    (4, 'one', 'en', 'src4', 3),
    (5, 'one', 'en', 'src5', 3),
    (6, 'café naïve 中文文档 üöä', 'de', 'src6', 20),
    (7, repeat('tok ', 5000), 'en', 'src7', 20000),
    (8, repeat('x', 2000), 'zh', 'src8', 2000),
    (9, 'normal words in a short document', 'en', 'src9', 32),
    (10, 'normal words in a short document', 'en', 'src10', 32),
    (11, 'a', 'en', 'src11', 1),
    -- near-dup pair differing by ONE char (dog->dogs): lengths 59/60
    -- share len band 3 under div-16 blocking, so dedup_ngram_jaccard
    -- must surface them (round-1 exact-length blocking never could)
    (12, 'the quick brown fox jumps over the lazy dog again and again', 'en', 'src12', 59),
    (13, 'the quick brown fox jumps over the lazy dogs again and again', 'en', 'src13', 60),
    -- planted PII (pii_redact must agree cross-engine on real matches,
    -- not just on the no-PII identity transform)
    (14, 'contact alice@example.com or bob.smith@corp.co.uk for info', 'en', 'src14', 58),
    (15, 'server at 192.168.0.1 and 10.0.0.255 responded', 'en', 'src15', 46),
    (16, 'call +1 555-123-4567 or 020 7946 0958 now', 'en', 'src16', 41)
  ) AS t(doc_id, text, lang, source, n_chars)
) TO '{out}' (FORMAT PARQUET)
"""

EMB_SQL = """
COPY (
  SELECT vec_id, embedding, label FROM '{base}/embeddings.parquet'
  UNION ALL
  SELECT 9000::BIGINT, list_transform(generate_series(1,64), i -> 0.0::FLOAT), 3
  UNION ALL
  SELECT 9001::BIGINT, list_transform(generate_series(1,64), i -> 0.0::FLOAT), 5
) TO '{out}' (FORMAT PARQUET)
"""

# written by DuckDB => standard MICROS timestamps (not the testdata NANOS)
EVENTS_SQL = """
COPY (
  SELECT event_id, ts, user_id, event_type, value, props
  FROM '{base}/events.parquet'
  UNION ALL SELECT * FROM (VALUES
    (90000::BIGINT, (SELECT min(ts) FROM '{base}/events.parquet'), 1::BIGINT,
     'purchase', NULL::DOUBLE, NULL),
    (90001, (SELECT min(ts) FROM '{base}/events.parquet'), 1, 'click', 1.5, '{{not json'),
    (90002, (SELECT min(ts) FROM '{base}/events.parquet'), 1, 'click', 2.5,
     '{{"k": "notanumber"}}'),
    (90003, (SELECT max(ts) FROM '{base}/events.parquet'), 777, 'purchase', 3.0,
     '{{"k": 7}}'),
    -- NULL-ts rows (ADVICE r4): user 888's ONLY signup has NULL ts —
    -- an unfiltered funnel oracle would count them at stage 1 while
    -- the Spark fold never sets t1; plus a NULL-ts click for an
    -- existing user so strictly-after chains see NULLs mid-stream.
    (90004, NULL, 888, 'signup', 1.0, NULL),
    (90005, (SELECT max(ts) FROM '{base}/events.parquet'), 888, 'click',
     1.0, NULL),
    (90006, NULL, 1, 'click', 1.0, NULL)
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{out}' (FORMAT PARQUET)
"""


def main() -> int:
    failures = 0
    for name, table, sql in (
        ("docs", "documents", DOCS_SQL),
        ("emb", "embeddings", EMB_SQL),
        ("events", "events", EVENTS_SQL),
    ):
        d = corpus(name, table, sql)
        print(f"=== edge corpus: {name} ({d})")
        rc = subprocess.run(
            [sys.executable, "tools/check_oracle.py", d],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).returncode
        if rc != 0:
            failures += 1
    print(f"\n{failures} corpora with mismatches")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
