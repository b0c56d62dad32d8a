"""Relational-parity query catalog — SURVEY.md §2.1/§2.2/§2.5/§2.6/§2.7.

Every scan / filter / projection / window / sort-limit / join / union /
set pattern the reference implements, re-expressed as one declarative
DataFrame query each, with a DuckDB oracle. The `events` table plays the
reference's `messages` table (user_id ≈ conversation_id, ts ≈ timestamp);
`documents` plays the vector-store provenance side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load_table
from .catalog import query


@query(
    "point_lookup",
    oracle="""
SELECT vec_id, label, len(embedding)::BIGINT AS dim
FROM embeddings WHERE vec_id = 42
""",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 `get_byid` (reference vectordb.py:111-144): point lookup by id.
    Catalyst pushes the equality predicate to the parquet scan
    (PushedFilters + row-group stats pruning); at 100 TB the table is
    bucketed/partitioned by id so this touches one partition.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") == 42).select(
        "vec_id", "label", F.size("embedding").cast("long").alias("dim")
    )


@query(
    "projection_scan",
    oracle="""
SELECT vec_id, len(embedding)::BIGINT AS dim, round(embedding[1]::DOUBLE, 6) AS first_component
FROM embeddings
""",
)
def projection_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 `as_array` / P1 (reference vectordb.py:157-172): project only
    (id, vector) — column pruning means the scan never reads other columns
    (ReadSchema shows just the two)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_component"),
    )


@query(
    "ttl_expiry",
    oracle="""
SELECT event_id, event_type, ts
FROM events
WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
""",
)
def ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 cache TTL (reference cache.py:45-51: DELETE WHERE stamp older
    than 1 month): the surviving-rows side of a TTL sweep with a fixed
    cutoff. Range predicate on ts is pushed to the scan; with date
    partitioning this is pure partition pruning at scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp")).select(
        "event_id", "event_type", "ts"
    )


@query(
    "id_set_filter",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_id IN (1, 2, 3, 42, 99, 12345)
""",
)
def id_set_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 id-set filter (reference app.py:311-312 `Message.id.in_(ids)`);
    small IN-lists stay pushdown-able predicates; large delete-sets become
    a broadcast semi-join instead (see delete_anti_join)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id").isin(1, 2, 3, 42, 99, 12345)).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "skiplist_filter",
    oracle="""
SELECT doc_id, source FROM documents
WHERE NOT regexp_matches(source, '[13579]$')
""",
)
def skiplist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 directory skiplist (reference reader.py:363-366 drops .git /
    __pycache__ paths): negative regex filter on the provenance column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(~F.col("source").rlike("[13579]$")).select("doc_id", "source")


@query(
    "history_limit",
    oracle="""
SELECT event_id, ts, event_type
FROM events WHERE user_id = 5 AND ts IS NOT NULL
ORDER BY ts ASC, event_id ASC LIMIT 200
""",
)
def history_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 conversation history (reference app.py:280-287: ORDER BY
    timestamp ASC LIMIT 200): filter + global limit plans a
    TakeOrderedAndProject, not a full sort. Explicit event_id tiebreak
    (the reference relies on implicit SQLite order — SURVEY.md §7.7).
    NULL ts filtered per the event-time convention: Spark sorts ASC
    NULLS FIRST, DuckDB NULLS LAST, so the LIMIT cut diverges the
    moment a conversation exceeds it with NULL-ts rows present."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("user_id") == 5) & F.col("ts").isNotNull())
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .limit(200)
        .select("event_id", "ts", "event_type")
    )


@query(
    "last_n_window",
    oracle="""
SELECT user_id, event_id, ts, rnk FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)::BIGINT AS rnk
  FROM events WHERE ts IS NOT NULL
) WHERE rnk <= 20
""",
)
def last_n_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 last-20-messages-per-conversation (reference app.py:341-348:
    Python slice `[-20:]` after a full sorted fetch). One shuffle on the
    partition key; Spark's WindowGroupLimit pushes the rank<=20 limit into
    the sort at scale. NULL ts filtered per the event-time convention
    (rank membership must not depend on engine null-ordering)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 20)
        .select("user_id", "event_id", "ts", "rnk")
    )


@query(
    "latest_event",
    oracle="""
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts IS NOT NULL
) WHERE rn = 1
""",
)
def latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 newest-by-mtime (reference reader.py:210-222 `max(files,
    key=mtime)`): argmax per group with a deterministic tiebreak.
    NULL ts filtered per the event-time convention — a group whose
    events are ALL NULL-ts has no argmax; engine null-ordering would
    otherwise pick arbitrary (and different) winners."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )


@query(
    "group_counts",
    oracle="""
SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY event_type
""",
)
def group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 COUNT(*) (reference cache.py:150-151) widened to a grouped
    aggregate — partial (map-side) aggregation shuffles only one row per
    (partition, group)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "dual_store_join",
    oracle="""
SELECT e.vec_id AS vec_id, e.label AS label, d.lang AS lang, d.n_chars AS n_chars
FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
""",
)
def dual_store_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 dual-store correlation (reference app.py:213-227: messages.id ==
    qdrant point id). Equi-join on the shared id; AQE picks broadcast when
    one side is small, else a co-partitioned sort-merge join (at scale:
    bucket both tables by id so the shuffle disappears)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    return emb.join(docs, emb["vec_id"] == docs["doc_id"]).select(
        "vec_id", "label", "lang", "n_chars"
    )


@query(
    "delete_anti_join",
    oracle="""
SELECT d.doc_id, d.source FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM documents x WHERE x.doc_id % 10 = 0 AND x.doc_id = d.doc_id
)
""",
)
def delete_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 delete-conversation (reference app.py:300-314): delete = anti-join
    against the doomed key set; on Delta this is the DELETE rewrite."""
    docs = load_table(spark, sf_dir, "documents")
    doomed = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    return docs.join(F.broadcast(doomed), "doc_id", "left_anti").select("doc_id", "source")


@query(
    "union_sources",
    oracle="""
SELECT doc_id, lang FROM documents WHERE lang = 'en'
UNION ALL
SELECT doc_id, lang FROM documents WHERE lang = 'zh'
""",
)
def union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 multi-spec union (reference reader.py:1155-1158 list concat of
    per-spec entries): unionByName of two source scans — no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    zh = docs.filter(F.col("lang") == "zh").select("doc_id", "lang")
    return en.unionByName(zh)


@query(
    "spec_expansion",
    oracle="""
SELECT printf('%04d-%02d', y, m) AS spec
FROM generate_series(2021, 2025) AS ys(y)
CROSS JOIN (SELECT unnest([4, 5]) AS m)
""",
)
def spec_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 mailing-list range expansion (reference reader.py:603-641:
    `2021-2025/:` × month list → URL cartesian product): explode(sequence)
    × crossJoin — the fan-out seed for S15-style fetch pipelines."""
    years = spark.range(1).select(F.explode(F.sequence(F.lit(2021), F.lit(2025))).alias("y"))
    months = spark.range(1).select(F.explode(F.array(F.lit(4), F.lit(5))).alias("m"))
    return years.crossJoin(months).select(F.format_string("%04d-%02d", "y", "m").alias("spec"))


@query(
    "cache_upsert",
    oracle="""
WITH updates AS (
  SELECT doc_id AS key, 'updated' AS value FROM documents WHERE doc_id < 10
),
kept AS (
  SELECT d.doc_id AS key, d.source AS value FROM documents d
  WHERE d.doc_id >= 10
)
SELECT key, value FROM updates UNION ALL SELECT key, value FROM kept
""",
)
def cache_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 cache INSERT OR REPLACE (reference cache.py:78-80): upsert =
    updates ∪ (base ⟕̸ updates) — on Delta this is MERGE; here the
    anti-join rewrite on plain parquet."""
    docs = load_table(spark, sf_dir, "documents")
    updates = docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("key"), F.lit("updated").alias("value")
    )
    base = docs.select(F.col("doc_id").alias("key"), F.col("source").alias("value"))
    kept = base.join(F.broadcast(updates.select("key")), "key", "left_anti")
    return updates.unionByName(kept)


@query(
    "json_extract",
    oracle="""
SELECT event_id,
       TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                     THEN json_extract_string(props, '$.k') END AS BIGINT)
         AS k_val
FROM events WHERE event_id < 100
""",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 JSON decode (reference frontend.py:182-183 session JSON;
    events.props carries a JSON payload here). Malformed payloads must
    yield NULL on BOTH engines (fuzz gate, seed 101 — the curated edge
    corpus's malformed rows all sit outside this id range): Spark's
    get_json_object returns NULL for unparseable JSON and ANSI-raises
    on a non-numeric cast, so the Spark side uses try_cast; DuckDB's
    json_extract_string RAISES on unparseable JSON, so the oracle
    guards with json_valid and TRY_CASTs the non-numeric case."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 100).select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_val"),
    )


@query(
    "vdb_dump",
    oracle="""
SELECT d.doc_id AS id, d.source, d.text,
       strlen(d.text)::BIGINT AS n_bytes, len(e.embedding)::BIGINT AS dim
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
WHERE d.doc_id < 200
""",
)
def vdb_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 `vdb dump` export (reference vectordb.py:258-279, cli.py:114-133):
    rows with provenance + text, vector payload EXCLUDED
    (include_vector=False → drop the array, keep its dim) — the id-range
    predicate mirrors the CLI's id selection and prunes the scan. The
    actual sink is `df.write.json(...)`; the query returns the projected
    rows the dump would serialize (the driver gate hashes values, not
    files)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        docs.filter(F.col("doc_id") < 200)
        .join(emb, docs.doc_id == emb.vec_id)
        .select(
            F.col("doc_id").alias("id"),
            "source",
            "text",
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.size("embedding").cast("long").alias("dim"),
        )
    )


@query(
    "vdb_dump_vectors",
    oracle="""
WITH dumped AS (
  SELECT d.doc_id AS id, d.source,
         strlen(d.text)::BIGINT AS n_bytes,
         len(e.embedding)::BIGINT AS dim,
         array_to_string(list_transform(e.embedding,
           x -> round(x::DOUBLE * 1000000)::BIGINT::VARCHAR), ',') AS vec_txt
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
  WHERE d.doc_id < 200
)
SELECT id, source, n_bytes, dim, vec_txt,
       list_sum(list_transform(string_split(vec_txt, ','),
                               s -> s::BIGINT))::BIGINT AS vec_sum
FROM dumped
""",
)
def vdb_dump_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 `vdb dump --include-vector` (reference vectordb.py:258-279:
    include_vector=True serializes the embedding into each exported
    row) — the half the round-3 catalog left rows-only. The vector
    payload serializes as exact 1e-6-scaled integers (cross-engine
    stable where raw float repr is not), and the query PARSES ITS OWN
    SERIALIZATION back (vec_sum over the split string) so the oracle
    hash certifies the full dump → parse round trip, not just the
    projection. Same scan-pruning id predicate as `vdb_dump`."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    vec_txt = F.array_join(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1000000).cast("long").cast("string"),
        ),
        ",",
    )
    return (
        docs.filter(F.col("doc_id") < 200)
        .join(emb, docs.doc_id == emb.vec_id)
        .select(
            F.col("doc_id").alias("id"),
            "source",
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.size("embedding").cast("long").alias("dim"),
            vec_txt.alias("vec_txt"),
        )
        .withColumn(
            "vec_sum",
            F.aggregate(
                F.split(F.col("vec_txt"), ","),
                F.lit(0).cast("long"),
                lambda acc, s: acc + s.cast("long"),
            ),
        )
    )


@query(
    "template_lookup",
    oracle="""
WITH templates(lang, template) AS (
  VALUES ('en', 'Summarize this document: %s'),
         ('es', 'Resume este documento: %s'),
         ('zh', 'Summarize (zh): %s'),
         ('de', 'Fasse zusammen: %s')
)
SELECT d.doc_id, printf(t.template, substr(d.text, 1, 40)) AS prompt
FROM documents d JOIN templates t ON t.lang = d.lang
WHERE d.doc_id < 100
""",
)
def template_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20 static template table (reference nm_templates.py:19-96: a
    literal dict of prompt texts dispatched by key, some entries
    triggering further reads). Spark shape: the dict IS a broadcast
    lookup table — a literal DataFrame broadcast-joined onto the data,
    with F6-style template formatting. At any scale the template side is
    bytes; the join never shuffles the big side."""
    docs = load_table(spark, sf_dir, "documents")
    templates = spark.createDataFrame(
        [
            ("en", "Summarize this document: %s"),
            ("es", "Resume este documento: %s"),
            ("zh", "Summarize (zh): %s"),
            ("de", "Fasse zusammen: %s"),
        ],
        "lang string, template string",
    )
    return (
        docs.filter(F.col("doc_id") < 100)
        .join(F.broadcast(templates), "lang")
        .select(
            "doc_id",
            F.expr("printf(template, substr(text, 1, 40))").alias("prompt"),
        )
    )
