"""Build the 10x-tiled dup-saturated corpus at /tmp/scale10.

Every sf0.1 document becomes a 10-member duplicate class: 5 exact
copies + 5 near-dup perturbations (one extra distinct token each), the
deliberately adversarial corpus SCALING.md's dedup rows are measured
on. doc_id = orig * 10 + copy keeps ids disjoint and deterministic.

Usage: python tools/make_scale10.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402


def build(spark, src: str, out: str) -> None:
    docs = spark.read.parquet(f"{src}/documents.parquet")
    copies = docs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("copy")
    )
    tiled = copies.select(
        (F.col("doc_id") * 10 + F.col("copy")).alias("doc_id"),
        F.when(F.col("copy") < 5, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" pert"), F.col("copy")))
        .alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text").cast("int"))
    os.makedirs(out, exist_ok=True)
    tiled.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    # embeddings tiled the same way: exact copies (0-4) keep the vector,
    # perturbed copies (5-9) nudge ONE deterministic dimension — a
    # near-dup class in embedding space mirroring the text classes
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    ecopies = emb.select("*", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("copy"))
    dim = F.size("embedding")
    # nudge factor (copy - 4) ∈ {1..5} — strictly nonzero for every
    # perturbed copy, so the class really is 5 exact + 5 near-dup
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            (F.col("copy") >= 5) & (i == F.col("vec_id") % dim),
            x + (F.col("copy") - 4) * F.lit(0.01),
        ).otherwise(x),
    )
    etiled = ecopies.select(
        (F.col("vec_id") * 10 + F.col("copy")).alias("vec_id"),
        perturbed.alias("embedding"),
        "label",
        *[c for c in emb.columns if c not in ("vec_id", "embedding", "label")],
    )
    etiled.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # events tiled as 10x USERS (horizontal growth — each copy is a new
    # user with the same per-user history): the event-family measurements
    # (asof/range/funnel/retention/rolling/sessionize) scale in users,
    # which is how a real event table grows. ts shifts by `copy` seconds
    # so copies aren't bit-identical streams; event_ids stay unique.
    # NOTE ts arrives as LONG nanos (session nanosAsLong) and is written
    # back as LONG — load_table's bigint → timestamp_micros conversion
    # applies to the tiled table exactly as to the source.
    ev = spark.read.parquet(f"{src}/events.parquet")
    ecop = ev.select("*", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("copy"))
    ts_type = dict((f.name, f.dataType.simpleString()) for f in ev.schema.fields)[
        "ts"
    ]
    shifted = (
        (F.col("ts") + F.col("copy").cast("long") * F.lit(1_000_000_000))
        if ts_type == "bigint"  # LONG nanos (nanosAsLong reads)
        else F.col("ts") + F.make_interval(secs=F.col("copy").cast("double"))
    )
    evt = ecop.select(
        (F.col("event_id") * 10 + F.col("copy")).alias("event_id"),
        shifted.alias("ts"),
        (F.col("user_id") * 10 + F.col("copy")).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    # single FILE named events.parquet (matching the testdata layout):
    # the streaming source narrows the sf dir with
    # pathGlobFilter='events.parquet', which matches file names — a
    # directory of part-files would be invisible to it
    import glob as _glob
    import shutil as _shutil

    tmp_ev = f"{out}/.events_build"
    evt.coalesce(1).write.mode("overwrite").parquet(tmp_ev)
    part = _glob.glob(f"{tmp_ev}/part-*.parquet")[0]
    _shutil.rmtree(f"{out}/events.parquet", ignore_errors=True)
    os.replace(part, f"{out}/events.parquet")
    _shutil.rmtree(tmp_ev)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10"
    spark = get_spark(app_name="make_scale10")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, out)
    n = spark.read.parquet(f"{out}/documents.parquet").count()
    print(f"{out}: {n} docs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
