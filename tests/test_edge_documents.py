"""Degenerate-document robustness: the engine contract on NULL/empty/
whitespace/unicode/giant texts (see plans.catalog._DOCS_NORMALIZED).

The full cross-engine check runs via `tools/check_oracle.py <edge_dir>`
(all 63 queries were verified to agree with DuckDB on this corpus);
here we pin the Spark-side behaviors that used to crash or diverge.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F


EDGE_DOCS = [
    (0, "", "en", "src0", 0),
    (1, None, "en", "src1", 0),        # NULL text → reads as empty doc
    (2, "   ", "es", "src2", 3),
    (3, "\t\n  \n", "es", "src3", 6),
    (4, "one", "en", "src4", 3),
    (5, "one", "en", "src5", 3),
    (6, "café naïve 中文文档 üöä", "de", "src6", 20),
    (7, "tok " * 5000, "en", "src7", 20000),
    (8, "x" * 2000, "zh", "src8", 2000),
    (9, "normal words in a short document", "en", "src9", 32),
    (10, "normal words in a short document", "en", "src10", 32),
    (11, "a", "en", "src11", 1),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    docs = spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    import shutil

    for t in ("embeddings", "events"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")
    return str(d)


def test_null_text_reads_as_empty(spark, edge_dir):
    from debgpt7_8_with_vectordb_spark.tables import load_table

    docs = load_table(spark, edge_dir, "documents")
    assert docs.filter(F.col("text").isNull()).count() == 0
    assert docs.filter("doc_id = 1").first()["text"] == ""


def test_text_queries_survive_degenerate_docs(spark, edge_dir):
    """Used to raise ANSI DIVIDE_BY_ZERO on token-less docs."""
    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    stats = {r["doc_id"]: r for r in QUERIES["text_stats"](spark, edge_dir).collect()}
    assert stats[0]["n_tokens"] == 0 and stats[0]["avg_token_bytes"] is None
    assert stats[6]["n_bytes"] > stats[6]["n_chars_actual"]  # multi-byte utf-8

    q = {r["doc_id"]: r for r in QUERIES["quality_score"](spark, edge_dir).collect()}
    assert q[1]["stopword_ratio"] is None  # NULL-text doc: no tokens
    assert q[9]["quality"] is not None


def test_minhash_excludes_tokenless_docs(spark, edge_dir):
    """Token-less docs have no signature — they must not all collide on
    an empty-signature bucket (they are NOT near-dups of each other;
    dedup_exact owns identical-empty handling)."""
    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    pairs = QUERIES["dedup_minhash_lsh"](spark, edge_dir).collect()
    ids_in_pairs = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert not ids_in_pairs & {0, 1, 2, 3}  # token-less docs absent
    assert (4, 5) in {(r["doc_a"], r["doc_b"]) for r in pairs}  # real dups found

    keep = {r["doc_id"]: r for r in QUERIES["dedup_lsh_keep"](spark, edge_dir).collect()}
    assert keep[5]["canon_id"] == 4 and not keep[5]["keep"]
    assert 0 not in keep  # no signature → not in the keep table


def test_ngram_jaccard_no_divide_by_zero(spark, edge_dir):
    """A pair of token-less docs blocked together is 0/0 — must be
    filtered, not raised."""
    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    rows = QUERIES["dedup_ngram_jaccard"](spark, edge_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (0, 1) not in pairs  # both empty: jaccard undefined, excluded
    assert (9, 10) in pairs  # exact dup pair found with jaccard 1.0


def test_zero_vector_cosine_is_null_not_crash(spark):
    from debgpt7_8_with_vectordb_spark.functions.vector import cosine_similarity

    df = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [1.0, 0.0])],
        "id long, a array<float>, b array<float>",
    )
    out = {r["id"]: r["c"] for r in df.select(
        "id", cosine_similarity(F.col("a"), F.col("b")).alias("c")
    ).collect()}
    assert out[1] is None
    assert out[2] == pytest.approx(1.0)


def test_zero_vectors_rank_last_in_topk(spark, tmp_path):
    """Planted zero vectors get NULL scores and NEVER displace real
    results from the top-k (NULL sorts last under desc on both engines —
    verified cross-engine via the edge-embeddings oracle gate)."""
    import shutil

    d = tmp_path / "sf"
    d.mkdir()
    for t in ("documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")
    emb = spark.read.parquet(str(d / "embeddings.parquet"))
    dim = len(emb.first()["embedding"])
    zeros = spark.createDataFrame(
        [(9000, [0.0] * dim, 3), (9001, [0.0] * dim, 5)],
        "vec_id long, embedding array<float>, label int",
    )
    emb.unionByName(zeros).write.mode("overwrite").parquet(str(d / "embeddings.parquet.new"))
    (d / "embeddings.parquet").unlink()  # the copied testdata file (not a dir)
    (d / "embeddings.parquet.new").rename(d / "embeddings.parquet")

    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    rows = QUERIES["topk_retrieval"](spark, str(d)).collect()
    assert len(rows) == 3
    assert all(r["vec_id"] not in (9000, 9001) for r in rows)
    assert all(r["score"] is not None for r in rows)


def test_pii_redact_planted_matches(spark, tmp_path):
    """The main corpus has no PII (identity transform); planted docs
    prove each pattern fires and the replace chain composes."""
    import shutil

    d = tmp_path / "sf"
    d.mkdir()
    docs = spark.createDataFrame(
        [
            (14, "contact alice@example.com or bob.smith@corp.co.uk for info", "en", "s", 58),
            (15, "server at 192.168.0.1 and 10.0.0.255 responded", "en", "s", 46),
            (16, "call +1 555-123-4567 or 020 7946 0958 now", "en", "s", 41),
            (17, "no pii here at all", "en", "s", 18),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    for t in ("embeddings", "events"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", d / f"{t}.parquet")

    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    out = {r["doc_id"]: r for r in QUERIES["pii_redact"](spark, str(d)).collect()}
    assert out[14]["n_emails"] == 2
    assert out[14]["clean_text"] == "contact <EMAIL> or <EMAIL> for info"
    assert out[15]["n_ips"] == 2
    assert out[15]["clean_text"] == "server at <IP> and <IP> responded"
    assert out[16]["n_phones"] == 2
    assert out[16]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert out[17]["clean_text"] == "no pii here at all"
    assert out[17]["n_emails"] == out[17]["n_ips"] == out[17]["n_phones"] == 0
