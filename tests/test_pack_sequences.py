"""pack_sequences invariants at sf0.001 (the oracle pins exact values at
sf0.01; these pin the packing CONTRACT on a second corpus).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from debgpt7_8_with_vectordb_spark.functions.text import tokens
from debgpt7_8_with_vectordb_spark.plans import QUERIES
from debgpt7_8_with_vectordb_spark.plans.dataflow_queries import _SEQ_TOKENS
from debgpt7_8_with_vectordb_spark.tables import load_table


def test_pack_sequences_invariants(spark, sf_dir):
    rows = QUERIES["pack_sequences"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tok")
    ).collect()

    # every document lands in exactly one sequence (token totals conserve)
    assert sum(r["n_docs"] for r in rows) == len(docs)
    assert sum(r["seq_tokens"] for r in rows) == sum(d["n_tok"] for d in docs)

    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    toks = {(d["lang"], d["doc_id"]): d["n_tok"] for d in docs}
    for lang, seqs in by_lang.items():
        seqs.sort(key=lambda r: r["seq_id"])
        # seq ids dense from 0; doc ranges contiguous and increasing
        assert [s["seq_id"] for s in seqs] == list(range(len(seqs)))
        for prev, cur in zip(seqs, seqs[1:]):
            assert prev["last_doc"] < cur["first_doc"]
        for s in seqs:
            # budget respected unless the sequence is a single oversized doc
            assert s["seq_tokens"] <= _SEQ_TOKENS or s["n_docs"] == 1
            # greedy tightness: a multi-doc successor could not have joined
            # its predecessor (first-fit leaves no room)
        for prev, cur in zip(seqs, seqs[1:]):
            first_tok = toks[(lang, cur["first_doc"])]
            assert prev["seq_tokens"] + first_tok > _SEQ_TOKENS
