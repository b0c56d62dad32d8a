"""Stream-stream join + in-stream dedup (Structured Streaming surfaces).

Two more §2.13 extension operators the batch catalog can't express
incrementally:

- **time-bounded stream-stream join**: two live feeds (here: purchase
  events vs other events of the same feed) joined on user with a
  ±interval time constraint — the attribution-join shape. Watermarks on
  BOTH sides bound the join state: a row can be evicted once the other
  side's watermark passes its end of the time range (this is what makes
  an unbounded two-stream join finite).
- **in-stream dedup**: `dropDuplicatesWithinWatermark` on the event id
  keeps one row per id seen within the watermark horizon — the
  streaming twin of `dedup_exact`, with state bounded by the watermark
  instead of growing with the feed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    window: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """purchases ⋈ clicks on user within ±window (both sides streaming).

    State bound: each side holds rows only until the other side's
    watermark clears the time-range — total state ≈ (event rate ×
    (window + watermark)) per side, independent of feed length."""
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "p_ts",
        "c_ts",
        "purchase_value",
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Keep the first row per event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
