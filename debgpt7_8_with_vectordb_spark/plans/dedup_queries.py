"""Deduplication query catalog — LLM-training-pipeline operators.

Exact (hash-groupBy), n-gram Jaccard (blocked pair verify), MinHash+LSH
(shingle → minhash → band → bucket join), SimHash fingerprinting, and
embedding-cosine near-dup. All are blocked/banded so the pair space stays
bounded at 100 TB: candidate generation is an equi-join on a blocking or
band key (shuffle on that key only), never an unblocked cross join.

Cross-engine hashing goes through md5 (functions/hashing.py) so every
query here has a full DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import md5_long, minhash_token_hash
from ..functions.text import distinct_tokens
from ..functions.vector import cosine_similarity
from ..tables import load_table
from .catalog import query

_TOKS = r"list_distinct(list_filter(string_split_regex({t}, '\s+'), x -> x <> ''))"
_MD5L = "(('0x' || substr(md5({e}), 1, 15))::BIGINT)"

N_PERMS = 16
BAND_SIZE = 4  # → 4 bands of 4 minhashes


@query(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS digest, min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS dup_count
FROM documents GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest, keep the smallest id.
    One shuffle on the digest (map-side partial agg shrinks it first);
    at 100 TB the digest is precomputed at ingest and the table is
    bucketed by it, making this shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.col("text").cast("binary")).alias("digest")).agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count("*").cast("long").alias("dup_count"),
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, n_chars, {_TOKS.format(t='text')} AS toks FROM documents
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.toks, b.toks))::DOUBLE AS inter,
         (len(a.toks) + len(b.toks))::DOUBLE AS total
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, round(inter / (total - inter), 6) AS jaccard
FROM pairs WHERE inter / (total - inter) >= 0.5
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup: candidate pairs blocked on
    (lang, n_chars) — an equi-join, NOT a cross join — then exact Jaccard
    over distinct token sets. Blocking bounds the pair space; the shuffle
    key is the blocking key."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", "n_chars", distinct_tokens(F.col("text")).alias("toks"))
    a = t.alias("a")
    b = t.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.n_chars") == F.col("b.n_chars"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.size(F.array_intersect("a.toks", "b.toks")).cast("double").alias("inter"),
        (F.size("a.toks") + F.size("b.toks")).cast("double").alias("total"),
    )
    jac = F.col("inter") / (F.col("total") - F.col("inter"))
    return pairs.filter(jac >= 0.5).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS.format(t='text')}) AS tok FROM documents
),
hashes AS (
  SELECT doc_id, p.perm,
         {_MD5L.format(e="p.perm::VARCHAR || '|' || tok")} AS h
  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, {N_PERMS - 1})) AS perm) p
),
minh AS (
  SELECT doc_id, perm, min(h) AS mh FROM hashes GROUP BY doc_id, perm
),
bands AS (
  SELECT doc_id, perm // {BAND_SIZE} AS band,
         array_to_string(array_agg(mh ORDER BY perm), ',') AS sig
  FROM minh GROUP BY doc_id, perm // {BAND_SIZE}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates: shingle → 16 keyed min-hashes →
    4 bands of 4 → docs sharing any band signature become candidates.

    Scale shape: tokens explode (narrow), groupBy (doc, perm) with
    map-side partial MIN, band join is an equi-join on (band, sig) —
    the classic way the O(n²) pair space collapses to hash buckets.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(distinct_tokens(F.col("text"))).alias("tok"))
    perms = spark.range(N_PERMS).select(F.col("id").cast("int").alias("perm"))
    hashes = toks.crossJoin(F.broadcast(perms)).select(
        "doc_id", "perm", minhash_token_hash(F.col("perm"), F.col("tok")).alias("h")
    )
    minh = hashes.groupBy("doc_id", "perm").agg(F.min("h").alias("mh"))
    bands = (
        minh.withColumn("band", (F.col("perm") / BAND_SIZE).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "mh"))),
                    lambda s: s["mh"].cast("string"),
                ),
                ",",
            ).alias("sig")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@query(
    "dedup_simhash",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS.format(t='text')}) AS tok FROM documents
),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN ({_MD5L.format(e='tok')} >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
           AS s
  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint: per bit, sum ±1 votes from each token's hash;
    bit set iff the vote is positive. Identical docs → identical hash;
    near-identical → small Hamming distance (pairable via bit_count(xor)).
    Two grouped aggregations, both with map-side partial sums."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(distinct_tokens(F.col("text"))).alias("tok"))
    bits = spark.range(32).select(F.col("id").cast("int").alias("bit"))
    votes = (
        toks.crossJoin(F.broadcast(bits))
        .withColumn("h", md5_long(F.col("tok")))
        .select(
            "doc_id",
            "bit",
            # shiftright with a COLUMN bit count needs the SQL form
            F.expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END").alias(
                "vote"
            ),
        )
    )
    bitsum = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("s"))
    return bitsum.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN s > 0 THEN shiftleft(1L, bit) ELSE 0L END"))
        .cast("long")
        .alias("simhash")
    )


@query(
    "embedding_neardup",
    oracle="""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_cosine_similarity(a.v, b.v), 6) AS score
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, score FROM pairs WHERE score >= 0.3
""",
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: pairs blocked on the cluster/label key
    (at scale: LSH bucket or IVF cluster id — a partition column), exact
    cosine within the block only."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(cosine_similarity(F.col("a.embedding"), F.col("b.embedding")), 6).alias(
            "score"
        ),
    )
    return pairs.filter(F.col("score") >= 0.3)
