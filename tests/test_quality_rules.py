"""Gopher Table-A1 quality gates (operators/quality_rules.py): each
rule caught by a purpose-built degenerate doc, the good doc passing,
signal columns exposed, and the all-JVM plan shape (no Python stage)."""

from __future__ import annotations

import pytest

from debgpt7_8_with_vectordb_spark.operators.quality_rules import (
    gopher_quality_filter,
    gopher_quality_signals,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs far away "
    "to be with the other animals that have made their home beside "
    "the river of plenty. "
) * 3  # ~75 words of ordinary prose with stopwords

DOCS = [
    (1, GOOD),
    (2, "too short to pass the gate"),  # word-count floor
    (3, "a " * 80),  # mean word length 1 < 3
    (4, ("#tag " * 30) + GOOD),  # hash ratio
    (5, GOOD + " ... " * 12),  # ellipsis ratio (12 / ~90 words > 0.1)
    (6, "\n".join("- bullet item %d here" % i for i in range(60))),  # bullets
    (7, ("1234 5678 90 " * 30) + "the of and that"),  # alpha fraction
    (8, " ".join("zebra%d" % i for i in range(80))),  # no stopwords
    (9, None),  # NULL text fails, never crashes
]


@pytest.fixture(scope="module")
def spark():
    from debgpt7_8_with_vectordb_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_each_gate_fires(spark, docs):
    kept = sorted(r["doc_id"] for r in gopher_quality_filter(docs).collect())
    assert kept == [1]


def test_signal_columns(spark, docs):
    sig = {r["doc_id"]: r for r in gopher_quality_signals(docs).collect()}
    assert sig[1]["n_words"] >= 50 and sig[1]["stopword_hits"] >= 2
    assert sig[3]["mean_word_len"] < 3
    assert sig[4]["hash_ratio"] > 0.1
    assert sig[5]["ellipsis_ratio"] > 0.1
    assert sig[6]["bullet_line_frac"] > 0.9
    assert sig[7]["alpha_word_frac"] < 0.8
    assert sig[8]["stopword_hits"] < 2
    assert sig[9]["n_words"] == 0


def test_keep_signals_and_schema(spark, docs):
    plain = gopher_quality_filter(docs)
    assert plain.columns == ["doc_id", "text"]
    monitored = gopher_quality_filter(docs, keep_signals=True)
    assert "hash_ratio" in monitored.columns


def test_plan_is_jvm_only(spark, docs):
    plan = (
        gopher_quality_filter(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan, marker


# ------------------------------------------------------- C4 line rules


def test_c4_clean_lines(spark):
    from debgpt7_8_with_vectordb_spark.operators.quality_rules import (
        c4_clean_lines,
    )

    page = "\n".join(
        [
            "This is a complete sentence that survives the cleaning pass.",
            "Menu",  # < 3 words
            "no terminal punctuation on this line",
            "Please enable JavaScript to view this site.",
            "We use cookie banners everywhere.",
            "Lorem ipsum dolor sit amet, consectetur.",
            "Another good sentence stays in the document!",
        ]
    )
    df = spark.createDataFrame(
        [(1, page), (2, "Menu\nHome\nAbout"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_clean_lines(df).collect()}
    kept = rows[1]["text"].split("\n")
    assert kept == [
        "This is a complete sentence that survives the cleaning pass.",
        "Another good sentence stays in the document!",
    ]
    assert rows[1]["lines_total"] == 7 and rows[1]["lines_dropped"] == 5
    assert rows[2]["text"] == "" and rows[2]["lines_dropped"] == 3
    assert rows[3]["text"] == "" and rows[3]["lines_total"] == 0
    plan = c4_clean_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
