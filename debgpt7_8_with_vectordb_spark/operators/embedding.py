"""Embedding pipeline operators (reference E1-E3, R3 — SURVEY.md §2.11).

The reference wraps provider HTTP APIs (OpenAI / Google / local
sentence-transformers) behind ``AbstractEmbeddingModel`` with a
truncate-to-dim + L2-normalize post-step (embeddings.py:62-279). Spark
shape:

- the provider call is an Arrow-batched ``mapInPandas`` stage — one
  batch per provider request (the reference's ``batch_embed``, O11),
  per-executor client singleton, bounded retry (M5);
- the post-step (truncate + normalize) is the SAME Catalyst expression
  used everywhere else (functions/vector.py), applied AFTER the UDF so
  it stays JVM-side;
- the deterministic hash backend replaces the reference's
  nondeterministic RandomEmbedding (np.random, embeddings.py:137,151)
  for reproducible tests — and doubles as a cheap featurizer.

``bulk_index_build`` = embed → normalize → write partitioned parquet:
the batch index construction the north star asks for (no online ANN
serving).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.hashing import md5_long
from ..functions.vector import l2_normalize, truncate_dim

EmbedFn = Callable[[list[str]], list[list[float]]]


def hash_embed_expr(text: Column, dim: int = 64) -> Column:
    """Deterministic hash embedding as a pure Catalyst expression:
    component i = (md5_long(i | text) % 1000)/1000 - 0.5, then
    L2-normalized. Cross-engine reproducible (oracle: same md5 math)."""
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            md5_long(F.concat_ws("|", i.cast("string"), text)) % 1000
        ).cast("double")
        / 1000.0
        - 0.5,
    )
    return l2_normalize(raw)


def hash_embed_raw_py(text: str, dim: int = 64) -> list[float]:
    """Pre-normalization components of the hash embedding — what a
    provider would return; ``provider_embed`` applies truncate+normalize."""
    return [
        (int(hashlib.md5(f"{i}|{text}".encode()).hexdigest()[:15], 16) % 1000) / 1000.0
        - 0.5
        for i in range(dim)
    ]


def hash_provider_8(texts: list[str]) -> list[list[float]]:
    """Module-level deterministic provider fake (dim=8) — picklable to
    executors, stands in for a provider batch-embedding HTTP call."""
    return [hash_embed_raw_py(t, 8) for t in texts]


def hash_embed_py(text: str, dim: int = 64) -> list[float]:
    """Python twin of hash_embed_expr (for fakes/oracles in plain code)."""
    raw = [
        (int(hashlib.md5(f"{i}|{text}".encode()).hexdigest()[:15], 16) % 1000) / 1000.0
        - 0.5
        for i in range(dim)
    ]
    n = sum(x * x for x in raw) ** 0.5
    return [x / n for x in raw] if n else raw


def provider_embed(
    docs: DataFrame,
    embed_fn: EmbedFn,
    dim: int,
    text_col: str = "content",
    batch_size: int = 256,
    max_attempts: int = 5,
    backoff_s: float = 1.0,
) -> DataFrame:
    """E1/E2 provider-backed batch embedding via mapInPandas.

    ``embed_fn`` must be a module-level callable (pickled once per
    executor; build clients lazily inside it — M5 singleton hygiene).
    The truncate+normalize insert invariant (vectordb.py:81-86) is
    applied JVM-side after the UDF.

    M5 retry (reference embeddings.py:28-59 retries rate limits
    FOREVER with a fixed 15 s sleep): bounded attempts with exponential
    backoff instead — an unbounded retry inside a Spark task turns a
    provider outage into a hung stage; after ``max_attempts`` the raise
    hands over to Spark's task-retry as the backstop, keeping batches
    idempotent (pure function of the input rows).
    """
    cols = docs.columns

    def call_with_retry(batch: list[str]) -> list[list[float]]:
        import time as _time

        last: Exception | None = None
        for attempt in range(max_attempts):
            try:
                return embed_fn(batch)
            except Exception as exc:  # rate limit / transient transport
                last = exc
                if attempt < max_attempts - 1:
                    _time.sleep(backoff_s * (2**attempt))
        raise last  # type: ignore[misc]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = list(pdf[text_col].fillna(""))
            vecs: list[list[float]] = []
            for i in range(0, len(texts), batch_size):
                vecs.extend(call_with_retry(texts[i : i + batch_size]))
            yield pdf.assign(raw_vector=vecs)

    # raw vectors stay DOUBLE through the normalize (float32 truncation
    # before the norm shifts the 6th decimal); cast to float at write time
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)
    out = docs.mapInPandas(run, schema=f"{schema}, raw_vector array<double>")
    return out.select(
        *cols,
        l2_normalize(truncate_dim(F.col("raw_vector"), dim)).alias("vector"),
    )


def bulk_index_build(
    docs: DataFrame,
    out_path: str,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str | None = None,
    n_clusters: int = 16,
) -> None:
    """R3 batch index build: embed (deterministic backend) → assign a
    coarse cluster id (IVF partition key) → write parquet PARTITIONED by
    it, so probe-time cluster pruning = partition pruning at 100 TB."""
    embedded = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        hash_embed_expr(F.col(text_col), dim).alias("vector"),
    )
    keyed = embedded.withColumn(
        "cluster_id", (md5_long(F.col("text")) % n_clusters).cast("int")
    )
    writer = keyed.write.mode("overwrite")
    writer.partitionBy(partition_col or "cluster_id").parquet(out_path)
