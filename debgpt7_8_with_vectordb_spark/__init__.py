"""debgpt7_8_with_vectordb_spark — a PySpark-native analytics engine.

From-scratch re-expression of the query & data-processing capabilities of
the reference `RanRhoads84/debgpt7.8-with-vectorDB` (a vector store +
embedding pipeline + document chunker + MapReduce dataflow + semantic-memory
service), built Spark-first:

- DataFrame/SQL logical plans, Catalyst optimization, Tungsten execution
- native ``ARRAY<FLOAT>`` vector columns (no BLOB packing — reference
  vectordb.py:82-87 packs float32 bytes + lz4; Parquet subsumes both)
- broadcast joins for top-k provenance resolution (reference does N+1
  point lookups, vectordb.py:210-213)
- partition-parallel chunking / bin-packing / tree-reduce dataflow
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), ANN similarity search (brute-force
  oracle + IVF partition-pruned scale path), text analytics, multimodal
  column plumbing, streaming sessionization.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .tables import load_table, load_tables  # noqa: F401


def queries():
    """The named query catalog (lazy — importing plans loads all modules)."""
    from .plans import QUERIES

    return dict(QUERIES)
