"""10x scale check for the mapreduce reduce loops (SCALING.md).

Chunks all documents at 1x (sf0.1) and 10x (/tmp/scale10 tiled corpus),
then times tree_reduce and compact_reduce on the mapped chunks. A
~linear wall-time ratio (vs the former single-partition-window funnel)
is the acceptance gate for the round-2 fix.

Usage: python tools/scale_mapreduce.py [one_x_dir ten_x_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from debgpt7_8_with_vectordb_spark.operators.chunker import chunk_documents  # noqa: E402
from debgpt7_8_with_vectordb_spark.operators.mapreduce import (  # noqa: E402
    compact_reduce,
    map_phase,
    tree_reduce,
)
from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402
from debgpt7_8_with_vectordb_spark.tables import load_table  # noqa: E402


def run(spark, sf_dir: str) -> dict[str, float]:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_join(F.split("text", " "), "\n").alias("text")
    )
    chunks = chunk_documents(docs, 200)
    mapped = map_phase(chunks).localCheckpoint(eager=True)  # isolate reduce cost
    n = mapped.count()
    out = {"chunks": float(n)}
    t0 = time.time()
    final, rounds = tree_reduce(mapped)
    final.write.mode("overwrite").format("noop").save()
    out["tree_reduce_sec"] = round(time.time() - t0, 2)
    out["tree_rounds"] = float(rounds)
    t0 = time.time()
    final, rounds = compact_reduce(mapped, 400)
    final.write.mode("overwrite").format("noop").save()
    out["compact_reduce_sec"] = round(time.time() - t0, 2)
    out["compact_rounds"] = float(rounds)
    return out


def main() -> None:
    one_x = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ten_x = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10"
    spark = get_spark(app_name="scale_mapreduce")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the python worker pool + codegen
    spark.read.parquet(f"{one_x}/region.parquet").groupBy("r_name").count().count()
    for label, d in (("1x", one_x), ("10x", ten_x)):
        print(label, run(spark, d), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
