"""Built-in sources — each returns documents(path STRING, content STRING).

Coverage of the reference's reader surface (SURVEY.md §2.1):
- S8  text file        → ``spark.read.text(wholetext)``
- S10 directory walk   → glob scan + input_file_name + skiplist filter
- S13 stdin / literal  → driver-side createDataFrame
- S12 command          → driver-side subprocess → createDataFrame
- S6/S22 JSONL & session JSON → ``spark.read.json``
- parquet documents    → native scan
- S11/S15/S16 URL fan-out → spec-expansion DataFrame + injectable fetch
  stage (network absent here; see ``fanout.py``)

Binary-probe (S8's is_text_file): instead of decode-probing driver-side,
non-UTF-8 files surface as replacement chars; a filter drops them.
"""

from __future__ import annotations

import subprocess
import sys

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import register_source

SKIPLIST_RE = r"(^|/)(\.git|__pycache__)(/|$)"


def _docs(df: DataFrame) -> DataFrame:
    return df.select("path", "content")


@register_source("text")
def read_text_file(spark: SparkSession, path: str) -> DataFrame:
    """S8 (reference reader.py:225-253): one row per file, whole text."""
    return _docs(
        spark.read.text(path, wholetext=True)
        .withColumn("path", F.input_file_name())
        .withColumnRenamed("value", "content")
    )


@register_source("dir")
def read_directory(spark: SparkSession, path: str) -> DataFrame:
    """S10 (reference reader.py:353-376): recursive walk with skiplist.

    The reference os.walks driver-side; here the glob scan is distributed
    and the skiplist is a pushed-down path filter (P8).
    """
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .text(path, wholetext=True)
        .withColumn("path", F.input_file_name())
        .withColumnRenamed("value", "content")
    )
    return _docs(df.filter(~F.col("path").rlike(SKIPLIST_RE)))


@register_source("jsonl")
def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S6 dump format round-trip (reference vectordb.py:258-279)."""
    df = spark.read.json(path)
    cols = df.columns
    path_col = "path" if "path" in cols else ("source" if "source" in cols else None)
    content_col = "content" if "content" in cols else ("text" if "text" in cols else None)
    if not path_col or not content_col:
        raise ValueError(f"jsonl source needs path/source + content/text, got {cols}")
    return df.select(F.col(path_col).alias("path"), F.col(content_col).alias("content"))


@register_source("session")
def read_session_json(spark: SparkSession, path: str) -> DataFrame:
    """S22/T5 session transcript (reference frontend.py:180-184 dumps
    ``[{role, content}]`` JSON): one row per message, path = role#idx."""
    raw = spark.read.json(path, multiLine=True)
    w = F.monotonically_increasing_id()
    return raw.withColumn("idx", w).select(
        F.concat_ws("#", F.col("role"), F.col("idx")).alias("path"),
        F.col("content"),
    )


@register_source("cmd")
def read_cmd(spark: SparkSession, cmd: str) -> DataFrame:
    """S12 (reference reader.py:544-549): run a command driver-side,
    capture stdout as one document. Inherently driver-side (the spec IS
    one local process); the result immediately distributes."""
    out = subprocess.run(
        cmd, shell=True, capture_output=True, text=True, timeout=60
    ).stdout
    return spark.createDataFrame([(f"cmd:{cmd}", out)], "path string, content string")


@register_source("stdin")
def read_stdin(spark: SparkSession, _rest: str) -> DataFrame:
    """S13 (reference reader.py:673-675)."""
    return spark.createDataFrame(
        [("stdin", sys.stdin.read())], "path string, content string"
    )


@register_source("parquet_docs")
def read_parquet_documents(spark: SparkSession, path: str) -> DataFrame:
    """Native columnar documents table (the 100 TB default). Applies the
    engine contract (NULL text reads as the empty document — tables.py,
    plans.catalog) at the source boundary."""
    df = spark.read.parquet(path)
    if "path" in df.columns and "content" in df.columns:
        return _docs(df)
    return df.select(
        F.col("source").alias("path") if "source" in df.columns else F.col("doc_id").cast("string").alias("path"),
        F.coalesce(F.col("text"), F.lit("")).alias("content"),
    )


def pdf_decode_stub(payload: bytes) -> str:
    """S9 real-decoder entry point (reference reader.py:310-333 extracts
    page text via pypdf). pypdf is absent in this container — production
    wires ``pypdf.PdfReader(io.BytesIO(payload))`` page extraction here;
    tests inject a fake through the same seam to prove the plumbing."""
    raise NotImplementedError(
        "PDF text extraction requires pypdf; inject decoder= to read_pdf"
    )


def decode_binary_documents(
    df: DataFrame, decoder: "callable", content_col: str = "payload"
) -> DataFrame:
    """The injectable decode stage: Arrow-batched ``mapInPandas`` over
    binary payloads → (path, content). ``decoder(bytes) -> str`` is the
    pluggable slot (pypdf, tika, ...) — the same seam shape
    ``provider_embed`` uses for real embedding models: bytes arrive
    columnar via Arrow, the Python batch loop is the ONLY non-JVM hop,
    and partition parallelism is preserved."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "content": [
                        decoder(bytes(p) if p is not None else b"")
                        for p in pdf[content_col]
                    ],
                }
            )

    return df.mapInPandas(run, schema="path string, content string")


@register_source("pdf")
def read_pdf(spark: SparkSession, path: str, decoder=None) -> DataFrame:
    """S9 PDF source (reference reader.py:310-333): files load via the
    ``binaryFile`` source (bytes stay columnar, never hit the driver);
    text extraction runs through ``decode_binary_documents``'s
    injectable seam. Default decoder is the honest pypdf stub."""
    df = spark.read.format("binaryFile").load(path).select("path", F.col("content").alias("payload"))
    return decode_binary_documents(df, decoder or pdf_decode_stub)


@register_source("html")
def read_html(spark: SparkSession, path: str, extractor=None) -> DataFrame:
    """HTML → text source (reference reader.py:462-463 bs4.get_text).
    Default path is the JVM regexp strip chain (whole-stage codegen, no
    Python hop); pass ``extractor(bytes) -> str`` (e.g. real bs4) to run
    full-fidelity extraction through the same Arrow seam as PDFs."""
    df = (
        spark.read.text(path, wholetext=True)
        .withColumn("path", F.input_file_name())
        .withColumnRenamed("value", "content")
    )
    if extractor is not None:
        return decode_binary_documents(
            df.select("path", F.col("content").cast("binary").alias("payload")),
            extractor,
        )
    stripped = F.trim(
        F.regexp_replace(F.regexp_replace("content", "<[^>]+>", " "), r"\s+", " ")
    )
    return df.select("path", stripped.alias("content"))


@register_source("path")
def read_any_path(spark: SparkSession, path: str, decoder=None) -> DataFrame:
    """Fallthrough router by suffix (reference reader.py:989-1032)."""
    import os

    if path.endswith(".parquet"):
        return read_parquet_documents(spark, path)
    if path.endswith((".jsonl", ".ndjson")):
        return read_jsonl(spark, path)
    if path.endswith(".json"):
        return read_session_json(spark, path)
    if path.endswith(".pdf"):
        return read_pdf(spark, path, decoder=decoder)
    if path.endswith((".html", ".htm")):
        return read_html(spark, path, extractor=decoder)
    if os.path.isdir(path):
        return read_directory(spark, path)
    return read_text_file(spark, path)
