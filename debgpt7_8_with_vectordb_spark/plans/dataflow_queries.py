"""Dataflow query catalog — chunker / bin-packing / map-reduce /
multimodal (reference §2.9-§2.10, the non-relational core).

chunk_documents gets a full DuckDB oracle via a recursive CTE that
replays the bisection; binpack and mapreduce are order-dependent /
iterative (driver contract: rows-only checks); the multimodal decode
stub is deterministic md5 math, so it's fully oracled even though the
Spark side runs a real Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.binpack import chunk_and_pack
from ..operators.chunker import chunk_documents
from ..operators.mapreduce import mapreduce_echo as mr_echo
from ..operators.multimodal import (
    attach_binary_payload,
    decode_audio_metadata,
    decode_image_metadata,
    decode_image_pixel_stats,
    decode_video_metadata,
    fake_decode_metadata,
    synthesize_test_audio,
    synthesize_test_media,
    synthesize_test_media_patterned,
    synthesize_test_video,
)
from ..tables import fan_out, load_table
from .catalog import query

MAX_CHUNK_BYTES = 200  # bisection budget over word-per-line testdata docs
MAX_GROUP_BYTES = 400


def _docs_as_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Testdata documents are single-line; derive a line structure by
    treating each word as a line (the chunker's axis — reference splits
    content on '\\n', reader.py:1131)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.array_join(F.split("text", " "), "\n").alias("text")
    )


@query(
    "chunk_documents",
    oracle=f"""
WITH RECURSIVE base AS (
  -- line axis = newline-split of the derived doc; the Spark side joins
  -- words with newlines and the chunker re-splits, so newlines embedded
  -- in the original text merge into the axis; replace() reproduces that
  SELECT doc_id, string_split(replace(text, ' ', chr(10)), chr(10)) AS lines
  FROM documents
),
spans AS (
  SELECT doc_id, 0 AS s, len(lines) AS e FROM base
  UNION ALL
  SELECT sp.doc_id,
         CASE WHEN h.half = 0 THEN sp.s ELSE sp.s + ((sp.e - sp.s) // 2) END,
         CASE WHEN h.half = 0 THEN sp.s + ((sp.e - sp.s) // 2) ELSE sp.e END
  FROM spans sp
  JOIN base b USING (doc_id)
  CROSS JOIN (SELECT unnest([0, 1]) AS half) h
  WHERE sp.e - sp.s > 1
    AND strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) > {MAX_CHUNK_BYTES}
)
SELECT sp.doc_id AS doc_id, sp.s::INT AS start, sp.e::INT AS "end",
       strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10)))::BIGINT AS n_bytes
FROM spans sp JOIN base b USING (doc_id)
WHERE sp.e - sp.s <= 1
   OR strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) <= {MAX_CHUNK_BYTES}
""",
)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 recursive-bisection chunker (reference reader.py:1035-1115) as a
    distributed mapInPandas table function; the oracle replays the exact
    bisection with a recursive CTE (split at (e-s)//2, UTF-8 octet size of
    '\\n'-joined span, 1-line spans terminate)."""
    docs = _docs_as_lines(spark, sf_dir)
    chunks = chunk_documents(docs, MAX_CHUNK_BYTES, include_content=False)
    return chunks.select("doc_id", "start", "end", "n_bytes")


@query(
    "binpack_chunks",
    oracle=f"""
WITH RECURSIVE base AS (
  SELECT doc_id, string_split(replace(text, ' ', chr(10)), chr(10)) AS lines
  FROM documents
),
spans AS (
  SELECT doc_id, 0 AS s, len(lines) AS e FROM base
  UNION ALL
  SELECT sp.doc_id,
         CASE WHEN h.half = 0 THEN sp.s ELSE sp.s + ((sp.e - sp.s) // 2) END,
         CASE WHEN h.half = 0 THEN sp.s + ((sp.e - sp.s) // 2) ELSE sp.e END
  FROM spans sp
  JOIN base b USING (doc_id)
  CROSS JOIN (SELECT unnest([0, 1]) AS half) h
  WHERE sp.e - sp.s > 1
    AND strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) > {MAX_CHUNK_BYTES}
),
chunkrows AS (
  SELECT sp.doc_id, sp.s AS cstart, sp.e AS cend,
         strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) AS n_bytes
  FROM spans sp JOIN base b USING (doc_id)
  WHERE sp.e - sp.s <= 1
     OR strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) <= {MAX_CHUNK_BYTES}
),
ordered AS (
  SELECT doc_id, cstart, cend, n_bytes,
         row_number() OVER (PARTITION BY doc_id ORDER BY cstart) AS idx
  FROM chunkrows
),
walk AS (
  -- the greedy reset-accumulator scan, one recursion step per chunk:
  -- overflow starts a new group and resets the byte accumulator
  SELECT doc_id, idx, cstart, cend, n_bytes, 0 AS gid, n_bytes AS acc
  FROM ordered WHERE idx = 1
  UNION ALL
  SELECT o.doc_id, o.idx, o.cstart, o.cend, o.n_bytes,
         CASE WHEN w.acc + o.n_bytes > {MAX_GROUP_BYTES} THEN w.gid + 1 ELSE w.gid END,
         CASE WHEN w.acc + o.n_bytes > {MAX_GROUP_BYTES} THEN o.n_bytes ELSE w.acc + o.n_bytes END
  FROM walk w JOIN ordered o ON o.doc_id = w.doc_id AND o.idx = w.idx + 1
)
SELECT doc_id, gid::INT AS group_id, count(*)::BIGINT AS n_items,
       sum(n_bytes)::BIGINT AS group_bytes,
       min(cstart)::INT AS start, max(cend)::INT AS "end"
FROM walk GROUP BY doc_id, gid
""",
)
def binpack_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 greedy first-fit bin packing (reference mapreduce.py:53-91),
    FUSED with the chunker into one mapInPandas pass (both are pure
    per-document functions → zero shuffles; operators/binpack.py
    chunk_and_pack). The running total resets, so it is not a window —
    but it IS a linear recursion, and the oracle (round 2) replays the
    exact scan with a per-doc recursive CTE over chunk indexes on top of
    the recursive-bisection chunker CTE: full cross-engine hash check of
    chunking AND packing composed."""
    docs = _docs_as_lines(spark, sf_dir)
    return chunk_and_pack(docs, MAX_CHUNK_BYTES, MAX_GROUP_BYTES)


CROSSDOC_RANGE_WIDTH = 32  # docs per packing range (bounds per-task memory)


@query(
    "binpack_crossdoc",
    oracle=f"""
WITH RECURSIVE base AS (
  SELECT doc_id, string_split(replace(text, ' ', chr(10)), chr(10)) AS lines
  FROM documents
),
spans AS (
  SELECT doc_id, 0 AS s, len(lines) AS e FROM base
  UNION ALL
  SELECT sp.doc_id,
         CASE WHEN h.half = 0 THEN sp.s ELSE sp.s + ((sp.e - sp.s) // 2) END,
         CASE WHEN h.half = 0 THEN sp.s + ((sp.e - sp.s) // 2) ELSE sp.e END
  FROM spans sp
  JOIN base b USING (doc_id)
  CROSS JOIN (SELECT unnest([0, 1]) AS half) h
  WHERE sp.e - sp.s > 1
    AND strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) > {MAX_CHUNK_BYTES}
),
chunkrows AS (
  SELECT sp.doc_id, sp.s AS cstart,
         strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) AS n_bytes
  FROM spans sp JOIN base b USING (doc_id)
  WHERE sp.e - sp.s <= 1
     OR strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) <= {MAX_CHUNK_BYTES}
),
ordered AS (
  SELECT doc_id // {CROSSDOC_RANGE_WIDTH} AS range_id, doc_id, cstart, n_bytes,
         row_number() OVER (PARTITION BY doc_id // {CROSSDOC_RANGE_WIDTH}
                            ORDER BY doc_id, cstart) AS idx
  FROM chunkrows
),
walk AS (
  -- greedy reset-accumulator scan per RANGE — the stream crosses
  -- document boundaries inside the range
  SELECT range_id, doc_id, idx, n_bytes, 0 AS gid, n_bytes AS acc
  FROM ordered WHERE idx = 1
  UNION ALL
  SELECT o.range_id, o.doc_id, o.idx, o.n_bytes,
         CASE WHEN w.acc + o.n_bytes > {MAX_GROUP_BYTES} THEN w.gid + 1 ELSE w.gid END,
         CASE WHEN w.acc + o.n_bytes > {MAX_GROUP_BYTES} THEN o.n_bytes ELSE w.acc + o.n_bytes END
  FROM walk w JOIN ordered o ON o.range_id = w.range_id AND o.idx = w.idx + 1
)
SELECT range_id, gid::INT AS group_id, count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_items, sum(n_bytes)::BIGINT AS group_bytes,
       min(doc_id)::BIGINT AS first_doc, max(doc_id)::BIGINT AS last_doc
FROM walk GROUP BY range_id, gid
""",
)
def binpack_crossdoc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document C3 packing (SURVEY §4.3.1 second clause; VERDICT
    r3 next #6): small documents pack together instead of each paying a
    group. Two-pass shape — fixed-width doc-id ranges (deterministic
    stand-in for repartitionByRange boundaries) shuffle once, then a
    per-range sequential first-fit scan in (doc_id, start) order
    (operators/binpack.pack_chunks_crossdoc). The oracle replays range
    assignment + the cross-document greedy walk with a per-range
    recursive CTE on top of the bisection-chunker CTE.

    tests/test_binpack_crossdoc.py additionally property-tests the
    distributed result against a GLOBAL single-threaded greedy scan:
    per-range packing differs only by boundary groups (≤ 1 per range)."""
    from ..operators.binpack import pack_chunks_crossdoc

    docs = _docs_as_lines(spark, sf_dir)
    chunks = chunk_documents(docs, MAX_CHUNK_BYTES, include_content=False)
    return pack_chunks_crossdoc(
        chunks.select("doc_id", "start", "n_bytes"),
        MAX_GROUP_BYTES,
        CROSSDOC_RANGE_WIDTH,
    )


@query(
    "mapreduce_echo",
    oracle=f"""
WITH RECURSIVE base AS (
  SELECT doc_id, string_split(replace(text, ' ', chr(10)), chr(10)) AS lines
  FROM documents WHERE doc_id < 64
),
spans AS (
  SELECT doc_id, 0 AS s, len(lines) AS e FROM base
  UNION ALL
  SELECT sp.doc_id,
         CASE WHEN h.half = 0 THEN sp.s ELSE sp.s + ((sp.e - sp.s) // 2) END,
         CASE WHEN h.half = 0 THEN sp.s + ((sp.e - sp.s) // 2) ELSE sp.e END
  FROM spans sp
  JOIN base b USING (doc_id)
  CROSS JOIN (SELECT unnest([0, 1]) AS half) h
  WHERE sp.e - sp.s > 1
    AND strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) > {MAX_CHUNK_BYTES}
),
chunks AS (
  SELECT sp.doc_id, sp.s AS start,
         array_to_string(b.lines[sp.s + 1 : sp.e], chr(10)) AS chunk
  FROM spans sp JOIN base b USING (doc_id)
  WHERE sp.e - sp.s <= 1
     OR strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) <= {MAX_CHUNK_BYTES}
),
mapped AS (
  SELECT doc_id, start, regexp_replace(chunk, '(?s)(.).', '\\1', 'g') AS val
  FROM chunks
),
agg AS (
  SELECT string_agg(val, chr(10) ORDER BY doc_id, start) AS final, count(*) AS n
  FROM mapped
)
SELECT length(final)::BIGINT AS final_len, md5(final) AS digest,
       (CASE WHEN n <= 1 THEN 0 ELSE ceil(log2(n)) END)::BIGINT AS rounds
FROM agg
""",
)
def mapreduce_echo_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+A4 map → binary tree-reduce (reference mapreduce.py:148-431)
    with the deterministic echo-lossy extractor (frontend.py:289-293).
    Iterative shrinking-DataFrame loop — yet FULLY oracle-able (round 2):
    the '\\n'-join combine is associative, so the binary tree's final
    string equals the flat ordered string_agg of the mapped chunks, and
    the adjacent-pairing round count is exactly ceil(log2(n)). The
    oracle replays chunker → echo map (dotall every-2nd-char regex) →
    ordered agg and pins all three output columns. (The compact variant
    stays rows-only: its round count depends on the greedy packing.)"""
    docs = _docs_as_lines(spark, sf_dir).filter(F.col("doc_id") < 64)
    chunks = chunk_documents(docs, MAX_CHUNK_BYTES)
    return mr_echo(chunks)


@query(
    "mapreduce_echo_compact",
    oracle=f"""
WITH RECURSIVE base AS (
  SELECT doc_id, string_split(replace(text, ' ', chr(10)), chr(10)) AS lines
  FROM documents WHERE doc_id < 64
),
spans AS (
  SELECT doc_id, 0 AS s, len(lines) AS e FROM base
  UNION ALL
  SELECT sp.doc_id,
         CASE WHEN h.half = 0 THEN sp.s ELSE sp.s + ((sp.e - sp.s) // 2) END,
         CASE WHEN h.half = 0 THEN sp.s + ((sp.e - sp.s) // 2) ELSE sp.e END
  FROM spans sp
  JOIN base b USING (doc_id)
  CROSS JOIN (SELECT unnest([0, 1]) AS half) h
  WHERE sp.e - sp.s > 1
    AND strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) > {MAX_CHUNK_BYTES}
),
chunks AS (
  SELECT sp.doc_id, sp.s AS start,
         array_to_string(b.lines[sp.s + 1 : sp.e], chr(10)) AS chunk
  FROM spans sp JOIN base b USING (doc_id)
  WHERE sp.e - sp.s <= 1
     OR strlen(array_to_string(b.lines[sp.s + 1 : sp.e], chr(10))) <= {MAX_CHUNK_BYTES}
),
mapped AS (
  SELECT doc_id, start, regexp_replace(chunk, '(?s)(.).', '\\1', 'g') AS val
  FROM chunks
),
sizes0 AS (
  SELECT list(strlen(val)::BIGINT ORDER BY doc_id, start) AS sizes FROM mapped
),
packrounds AS (
  -- one recursion step per REDUCE ROUND; the per-round greedy min-2
  -- packing (operators/binpack.py pack_sizes) is a list_reduce fold whose
  -- accumulator is [closed group sizes..., cur_bytes, cur_count]; closing
  -- a group costs sum(bytes) + count - 1 (the 1-byte '\\n' separators)
  SELECT 0 AS r, sizes FROM sizes0
  UNION ALL
  SELECT r + 1,
         (SELECT st[1:len(st)-2] || [st[-2] + st[-1] - 1]
          FROM (SELECT list_reduce(
            list_prepend([0::BIGINT, 0::BIGINT], list_transform(sizes, s -> [s])),
            (a, x) -> CASE
              WHEN a[-1] > 0 AND a[-2] + x[1] > {MAX_GROUP_BYTES} AND a[-1] >= 2
              THEN a[1:len(a)-2] || [a[-2] + a[-1] - 1, x[1], 1::BIGINT]
              ELSE a[1:len(a)-2] || [a[-2] + x[1], a[-1] + 1]
            END) AS st) t
         )
  FROM packrounds WHERE len(sizes) > 1
),
agg AS (
  SELECT string_agg(val, chr(10) ORDER BY doc_id, start) AS final FROM mapped
)
SELECT length(final)::BIGINT AS final_len, md5(final) AS digest,
       (SELECT max(r) FROM packrounds)::BIGINT AS rounds
FROM agg
""",
)
def mapreduce_echo_compact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2+A5 COMPACT mode (reference mapreduce.py:162-180, 287-326,
    353-431): echo map → n-ary bin-packed reduce (≥2 per group so each
    round strictly shrinks). Completes the reference's mode matrix
    alongside ``mapreduce_echo`` (binary). Converges in fewer rounds —
    fan-in is bounded by group byte budget, not fixed at 2.

    FULLY ORACLED (round 3): the '\\n'-join is associative, so final_len
    and digest equal the flat ordered string_agg (same argument as the
    binary oracle); the round count — the one output that depends on the
    greedy packing — is replayed exactly by a recursive CTE whose state
    is the ordered LIST of current string byte-sizes, advancing one
    reduce round per recursion step via a list_reduce fold of the
    first-fit min-2 scan. Group size after combine = sum + count - 1
    (1-byte separators), which is the only size information the next
    round's packing needs — so the sizes list is a complete state."""
    from ..operators.mapreduce import mapreduce_echo_compact as mr_compact

    docs = _docs_as_lines(spark, sf_dir).filter(F.col("doc_id") < 64)
    chunks = chunk_documents(docs, MAX_CHUNK_BYTES)
    return mr_compact(chunks, MAX_GROUP_BYTES)


_SEQ_TOKENS = 512  # training-sequence token budget


@query(
    "pack_sequences",
    oracle=f"""
WITH RECURSIVE d AS (
  SELECT doc_id, lang,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tok
  FROM documents
),
ordered AS (
  SELECT doc_id, lang, n_tok,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS idx
  FROM d
),
walk AS (
  SELECT lang, idx, doc_id, n_tok, 0 AS gid, n_tok AS acc
  FROM ordered WHERE idx = 1
  UNION ALL
  SELECT o.lang, o.idx, o.doc_id, o.n_tok,
         CASE WHEN w.acc + o.n_tok > {_SEQ_TOKENS} THEN w.gid + 1 ELSE w.gid END,
         CASE WHEN w.acc + o.n_tok > {_SEQ_TOKENS} THEN o.n_tok ELSE w.acc + o.n_tok END
  FROM walk w JOIN ordered o
    ON o.lang IS NOT DISTINCT FROM w.lang AND o.idx = w.idx + 1
)
SELECT lang, gid::INT AS seq_id, count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS seq_tokens,
       min(doc_id)::BIGINT AS first_doc, max(doc_id)::BIGINT AS last_doc
FROM walk GROUP BY lang, gid
""",
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-SEQUENCE packing — the cross-document counterpart of the
    per-document C3 bin packer: pretraining rows are fixed token budgets
    filled with MULTIPLE short documents (plus separators), so the
    pipeline needs a greedy first-fit scan ACROSS docs. Packing is per
    LANGUAGE stream (monolingual training shards — the real-world
    constraint that also gives the operator its parallelism): each lang
    group packs independently in one ``applyInPandas`` task, docs in
    doc_id order, overflow starts the next sequence.

    Scale shape: one shuffle on lang; a 100 TB corpus has bounded lang
    cardinality but unbounded docs-per-lang, so at scale the stream is
    further blocked into contiguous doc_id ranges exactly like
    compact_reduce's rn//4096 executor-side blocks (same pack_sizes
    loop, same order-preserving-slices argument; operators/mapreduce.py
    _PACK_BLOCK_ROWS). The oracle replays the exact per-lang greedy
    walk with a recursive CTE over doc-index recursion — the composed
    chunk+pack CTE pattern from ``binpack_chunks``. The walk's lang
    join is IS NOT DISTINCT FROM: Spark's groupBy groups NULL langs
    into one stream, and a plain ``=`` would strand that partition at
    idx 1 on the oracle side (fuzz gate, NULL-lang hazard)."""
    import pandas as pd

    from ..operators.binpack import pack_sizes
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tok")
    )

    def pack_lang(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        gids = pack_sizes(list(pdf["n_tok"]), _SEQ_TOKENS)
        pdf = pdf.assign(seq_id=gids)
        agg = (
            pdf.groupby("seq_id")
            .agg(
                lang=("lang", "first"),
                n_docs=("doc_id", "size"),
                seq_tokens=("n_tok", "sum"),
                first_doc=("doc_id", "min"),
                last_doc=("doc_id", "max"),
            )
            .reset_index()
        )
        return agg[["lang", "seq_id", "n_docs", "seq_tokens", "first_doc", "last_doc"]]

    return docs.groupBy("lang").applyInPandas(
        pack_lang,
        schema="lang string, seq_id int, n_docs long, seq_tokens long, "
        "first_doc long, last_doc long",
    )


@query(
    "multimodal_metadata",
    oracle="""
SELECT doc_id,
       strlen(text)::BIGINT AS n_bytes,
       md5(text) AS digest,
       (16 + (('0x' || substr(md5(text), 1, 15))::BIGINT % 240))::INT AS width,
       (16 + ((('0x' || substr(md5(text), 1, 15))::BIGINT // 240) % 240))::INT AS height
FROM documents
""",
)
def multimodal_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing: binary payload column → Arrow-batched
    mapInPandas 'decode' → typed metadata. The decode is a deterministic
    md5-derived fake (codecs absent here — operators/multimodal.py), so
    the full pandas-UDF path is exercised AND oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return fake_decode_metadata(media)


@query(
    "multimodal_decode",
    oracle="""
SELECT doc_id,
       CASE doc_id % 8 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                       WHEN 2 THEN 'bmp' WHEN 3 THEN 'p6'
                       WHEN 4 THEN 'jpeg' WHEN 5 THEN 'tiff'
                       WHEN 6 THEN 'webp' ELSE 'ico' END AS fmt,
       (1 + doc_id % 32)::INT AS width,
       (1 + (doc_id * 7) % 32)::INT AS height
FROM documents
""",
)
def multimodal_decode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-metadata decode round-trip (round 6 — the multimodal
    seam's first non-fake codec; rotation widened to the full round-7
    parser breadth in round 8): per document, fabricate a VALID image
    container (PNG/GIF/BMP/PPM/JPEG/TIFF/WebP/ICO rotating on doc_id,
    dimensions by fixed arithmetic) and parse it back through the
    zero-dependency header parser (operators/multimodal.py
    parse_image_header — struct layouts from the format specs,
    golden-byte-pinned in tests). The SQL
    oracle predicts the parsed metadata from the same arithmetic
    without touching bytes, so a parser or plumbing bug breaks the
    cross-engine hash. Scale shape: two chained Arrow stages (encode,
    decode), zero shuffle, scan-parallel; at 100 TB the encode stage is
    replaced by format('binaryFile') reads of actual media and the
    decode stage runs unchanged."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = synthesize_test_media(docs)
    return decode_image_metadata(media).select(
        "doc_id", "fmt", "width", "height"
    )


@query(
    "image_pixels",
    oracle="""
WITH p AS (
  SELECT doc_id,
         CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                         WHEN 2 THEN 'p6' WHEN 3 THEN 'gif'
                         WHEN 4 THEN 'tiff' ELSE 'webp' END AS fmt,
         (1 + doc_id % 32) AS w, (1 + (doc_id * 7) % 32) AS h,
         (doc_id % 251) AS seed
  FROM documents
), g AS (SELECT unnest(generate_series(0, 31)) AS v),
c AS (SELECT unnest(generate_series(0, 2)) AS c)
SELECT p.doc_id, p.fmt, p.w::INT AS width, p.h::INT AS height,
       3 AS channels,
       (p.w * p.h * 3)::BIGINT AS n_values,
       SUM((gx.v + 7 * gy.v + 11 * c.c + p.seed) % 256)::BIGINT AS pixel_sum,
       p.seed::INT AS first_px,
       ((p.w - 1 + 7 * (p.h - 1) + 22 + p.seed) % 256)::INT AS last_px
FROM p
JOIN g gx ON gx.v < p.w
JOIN g gy ON gy.v < p.h
CROSS JOIN c
GROUP BY p.doc_id, p.fmt, p.w, p.h, p.seed
""",
)
def image_pixels_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PIXEL decode round-trip (round 7 — the content half of the
    codec seam; VERDICT r6 #1 — widened round 8 to the lossless codecs
    shipped since: TIFF strips and WebP/VP8L): per document, fabricate
    a patterned VALID container (PNG with the row filter type cycling
    0-4, BMP bottom-up BGR with row padding, raw P6, GIF LZW, TIFF
    uncompressed RGB strip, VP8L with subtract-green + color cache +
    run LZ77 — rotating on doc_id) and decode the actual pixel bytes
    back through the zero-dependency decoder (operators/multimodal.py
    decode_image_pixels; webplcodec.py for VP8L — the GIF palette is
    constructed so the mapped channels equal the one shared pattern
    formula). The SQL oracle predicts count / sum /
    first / last of the normalized RGB stream from the shared pattern
    arithmetic without touching bytes — first_px/last_px pin top-down
    RGB order, so a decoder that skips BMP's row flip or BGR swap
    fails the hash even though the sum survives. Scale shape: two
    chained Arrow stages, zero shuffle, scan-parallel; at 100 TB the
    encode stage is a format('binaryFile') read and the decode slot
    swaps to PIL/numpy via the same injectable seam.

    The doc_id frame is fanned out BEFORE the two Python stages: the
    encode+decode pair is pure-Python per-row CPU, and a single-split
    bench file would otherwise run it all in one task (guide §2.5;
    measured 3.2 s → 0.9 s warm at sf0.1 — the shuffle moves 8-byte
    ids, and at real split counts fan_out is a no-op)."""
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )
    media = synthesize_test_media_patterned(docs)
    return decode_image_pixel_stats(media)


@query(
    "audio_metadata",
    oracle="""
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'wav' WHEN 1 THEN 'aiff'
                       WHEN 2 THEN 'au' ELSE 'flac' END AS fmt,
       (1 + doc_id % 2)::INT AS channels,
       (CASE (doc_id // 4) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        WHEN 2 THEN 22050 ELSE 44100 END)::INT AS sample_rate,
       (8 * (1 + (doc_id // 2) % 2))::INT AS bits,
       (CASE WHEN doc_id % 4 IN (1, 2)
             THEN (1 + doc_id % 50) * (1 + doc_id % 2)
             ELSE 1 + doc_id % 50 END)::BIGINT AS n_samples
FROM documents
""",
)
def audio_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-metadata decode round-trip (round 6; rotation widened
    round 8 to the parser breadth — the audio twin of
    ``multimodal_decode``): per document, fabricate a VALID container
    (WAV RIFF / AIFF IFF with the 80-bit-float rate / Sun .au / FLAC
    STREAMINFO, rotating on doc_id with channels/rate/bits/length by
    fixed arithmetic) and walk it back with the zero-dependency header
    parsers. The SQL oracle predicts the parsed metadata without
    touching bytes — including each format's frame-count convention
    (WAV/FLAC count frames; AIFF/.au report frames x channels). Same
    two-Arrow-stage zero-shuffle scale shape as multimodal_decode; at
    100 TB the encode stage is a binaryFile read of actual media."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_audio_metadata(synthesize_test_audio(docs))


@query(
    "video_metadata",
    oracle="""
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'mp4' WHEN 1 THEN 'avi'
                       WHEN 2 THEN 'mkv' ELSE 'webm' END AS fmt,
       (CASE doc_id % 4
          WHEN 0 THEN CASE (doc_id // 4) % 4 WHEN 0 THEN 600
                        WHEN 1 THEN 1000 WHEN 2 THEN 48000
                        ELSE 90000 END
          WHEN 1 THEN 1000000
          ELSE 1000 END)::INT AS timescale,
       (CASE doc_id % 4
          WHEN 1 THEN (1000 * (1 + doc_id % 4)) * (100 + doc_id % 50)
          ELSE 1000 + doc_id * 37 END)::BIGINT AS duration,
       (320 + (doc_id % 16) * 8)::INT AS width,
       (240 + (doc_id % 16) * 8)::INT AS height,
       (1 + doc_id % 3)::INT AS n_tracks
FROM documents
""",
)
def video_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-metadata decode round-trip — the third of the trio
    (multimodal_decode = images, audio_metadata = audio; rotation
    widened round 8 to the parser breadth): per document, fabricate a
    minimal VALID container (ISO BMFF ftyp+moov/mvhd+tkhd traks / AVI
    RIFF hdrl+avih / Matroska and WebM EBML with TimestampScale +
    float Duration — parameters by doc_id arithmetic) and walk it back
    with the zero-dependency parsers (operators/multimodal.py
    parse_video_header). The oracle predicts each container's
    timescale convention: mvhd's explicit field, AVI's microsecond
    clock with duration = usec-per-frame x frames, Matroska's
    ticks-per-second with Duration as ticks. Durations stay integral
    so the oracle is exact. Same zero-shuffle two-Arrow-stage shape;
    frame DECODE stays stubbed (frame_sample) — this is the
    filter-by-duration/resolution pass a video corpus runs first."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_video_metadata(synthesize_test_video(docs))


@query(
    "frame_sample",
    oracle="""
SELECT doc_id, unnest(generate_series(0, strlen(text) % 100, 10)) AS frame_idx
FROM documents
""",
)
def frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out: one row per sampled frame index
    (every 10th of the payload's fake frame count) — the explode-shaped
    half of the multimodal pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.octet_length("payload") % 100, F.lit(10))
        ).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))
