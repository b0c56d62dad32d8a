"""Bucketed co-located join: the shuffle-free J2 at scale.

The dual-store correlation (messages ⋈ embeddings on id — reference
app.py:213-227) is THE recurring join of the reference's workload. At
100 TB neither side broadcasts, so a plain join shuffles both tables
every query. Bucketing both tables by the join key at write time makes
every subsequent join shuffle-free: Spark reads co-located buckets and
zips them (SortMergeJoin with no Exchange).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    warehouse = str(tmp_path / "wh")
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    for name, df, key in (("docs_b", docs, "doc_id"), ("emb_b", emb, "vec_id")):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{warehouse}/{name}")
            .saveAsTable(f"bkt.{name}")
        )

    # disable auto-broadcast so the join strategy is the one a 100 TB
    # table would get (neither side fits in memory there)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = spark.table("bkt.docs_b").join(
            spark.table("bkt.emb_b"),
            F.col("doc_id") == F.col("vec_id"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: a sort-merge join with NO shuffle exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and it computes the same result as the plain join
        assert joined.count() == docs.join(
            emb, F.col("doc_id") == F.col("vec_id")
        ).count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt.docs_b")
        spark.sql("DROP TABLE IF EXISTS bkt.emb_b")
        spark.sql("DROP DATABASE IF EXISTS bkt")
