"""Grouped-aggregation / multi-join / sessionization analytics.

The reference has no grouped aggregation or joins (SURVEY.md §2.3/§2.4
"Absent"); these queries exercise the Spark-side machinery its extended
operators need (partial aggregation, broadcast dim joins, AQE), on the
TPC-H-ish star schema. Money sums are rounded to 2 decimals on both
engines (sum-order drift across partitions is far below that).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.rounding import half_up_scaled_ratio, half_up_scaled_ratio_sql
from ..tables import load_table
from .catalog import query


@query(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ({half_up_scaled_ratio_sql("round(sum(l_quantity))", "count(*)")}) / 1000000.0 AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: single wide scan → partial agg →
    6-group final agg. The range filter pushes to parquet row-group stats;
    only 7 of 11 columns are read (column pruning)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            # quantities are integer-valued: avg is a ratio of
            # integers -> exact half-up units (round-5 convention).
            # The numerator is a CORPUS-SCALE sum -> decimal-exact
            # scaled helper (no 2^53/int64 bound; ADVICE r5).
            (
                half_up_scaled_ratio(
                    F.round(F.sum("l_quantity")),
                    F.count("*").cast("long"),
                ).cast("double")
                / 1e6
            ).alias("avg_qty"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


@query(
    "shipping_priority",
    oracle="""
SELECT l.l_orderkey AS l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
""",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join + grouped top-10. customer is the small
    dim → broadcast; orders⋈lineitem shuffles on orderkey once and the
    aggregation reuses that partitioning (no second shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.filter(F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .join(
            o.filter(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "local_supplier_volume",
    oracle="""
SELECT n.n_name AS n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way join: region→nation→supplier are tiny dims
    (broadcast all), the fact-fact lineitem⋈orders shuffle is the only big
    exchange. Catalyst reorders the dim filters below the joins."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@query(
    "top_parts_by_revenue",
    oracle="""
SELECT p.p_brand AS p_brand,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY revenue DESC, p_brand ASC LIMIT 5
""",
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-join + grouped top-k: part is broadcast, aggregation is partial
    then final on p_brand (low cardinality → tiny shuffle)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
        .limit(5)
    )


@query(
    "sessionize_events",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 1 HOUR
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_start,
         event_id
  FROM events WHERE ts IS NOT NULL
),
sess AS (
  SELECT user_id, ts, event_id,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_id
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gap > 1 h starts a new session) — the batch
    twin of the Structured Streaming `session_window` pipeline in
    ``streaming/sessionize.py``. One shuffle on user_id shared by the lag
    window, the running sum, and the final group-by.

    ts IS NOT NULL on both engines: an event with no timestamp cannot
    be placed in a gap-based session, and the engines disagree on NULL
    ordering inside the lag window (Spark sorts NULLs first ascending,
    DuckDB last) — caught by the NULL-ts edge rows (round 5)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            # interval arithmetic, not a double cast: works for both
            # TIMESTAMP and TIMESTAMP_NTZ (standard-micros parquet reads
            # as NTZ, which cannot cast to double)
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 1 HOUR")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "rag_generate",
    oracle="""
WITH hist AS (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM events WHERE user_id < 5 AND ts IS NOT NULL
),
last20 AS (SELECT * FROM hist WHERE rn <= 20),
prompts AS (
  SELECT user_id,
         string_agg(event_type || ': '
                      || coalesce(round(value, 3)::VARCHAR, 'null'),
                    chr(10) ORDER BY ts ASC, event_id ASC) AS prompt
  FROM last20 GROUP BY user_id
)
SELECT user_id,
       length(prompt)::BIGINT AS prompt_len,
       regexp_replace(prompt, '(.).', '\\1', 'g') AS reply
FROM prompts
""",
)
def rag_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 batch RAG generate loop (reference app.py:333-356): last-20
    history per conversation (W1 window), chronological prompt concat
    (F6 templating), deterministic 'LLM' reply = every-2nd-char echo
    (the reference's own EchoFrontend lossy fake, frontend.py:289-293,
    here as one regexp — '(.).'→'\\1' keeps char 1 of each pair).
    user_id plays conversation_id on the events feed; the online
    serving hop stays out of Spark per the north star — this is the
    batch variant that backfills replies for N conversations in one
    pass. The reply backend resolves through the generation registry
    (operators/generation.py — reference backends.py:121-139)."""
    from ..operators.generation import generate_with_backend

    return generate_with_backend(_rag_prompts(spark, sf_dir), "echo").select(
        "user_id", "prompt_len", "reply"
    )


def _rag_prompts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared RAG prompt build: last-20 history per conversation,
    chronological concat.

    Two fuzz-gate (seed 101) conventions baked in: NULL event times are
    filtered on both engines (Spark sorts them FIRST ascending, DuckDB
    LAST — the prompt line order and the last-20 membership both
    diverge otherwise), and a NULL value renders as the literal 'null'
    on both engines (Spark's concat_ws silently skips NULL args while
    DuckDB's || nulls the line, which string_agg then drops — same
    multiset of events, different prompt)."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 5) & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    last20 = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 20)
    prompts = last20.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.concat(
                                "event_type",
                                F.lit(": "),
                                F.coalesce(
                                    F.round("value", 3).cast("string"),
                                    F.lit("null"),
                                ),
                            ).alias("line"),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("prompt")
    )
    return prompts.select(
        "user_id", F.length("prompt").cast("long").alias("prompt_len"), "prompt"
    )


@query(
    "rag_generate_reverse",
    oracle="""
WITH hist AS (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM events WHERE user_id < 5 AND ts IS NOT NULL
),
last20 AS (SELECT * FROM hist WHERE rn <= 20),
prompts AS (
  SELECT user_id,
         string_agg(event_type || ': '
                      || coalesce(round(value, 3)::VARCHAR, 'null'),
                    chr(10) ORDER BY ts ASC, event_id ASC) AS prompt
  FROM last20 GROUP BY user_id
)
SELECT user_id,
       length(prompt)::BIGINT AS prompt_len,
       reverse(prompt) AS reply
FROM prompts
""",
)
def rag_generate_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 through the SECOND registry backend ('reverse'): same prompt
    build, different backend name — the pair of queries proves the
    registry dispatches by name (reference backends.py:134-139) instead
    of hardcoding one fake, with both reply shapes hash-oracled."""
    from ..operators.generation import generate_with_backend

    return generate_with_backend(_rag_prompts(spark, sf_dir), "reverse").select(
        "user_id", "prompt_len", "reply"
    )


@query(
    "skew_salted_agg",
    oracle="""
SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 4) AS total
FROM events GROUP BY event_type
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant aggregation: a handful of event_type keys carry
    millions of rows each at 100 TB, so a naive groupBy funnels each hot
    key through ONE reducer. Salting splits every key 16 ways for the
    partial agg, then a second (tiny — n_keys × 16 rows) agg merges the
    partials. Same result as plain GROUP BY (the oracle), bounded
    per-task input regardless of key skew. (Spark's partial aggregation
    already map-side-combines; explicit salting additionally bounds the
    REDUCE side and is the pattern AQE skew-join generalizes.)"""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("long").alias("n"),
        F.round(F.sum("pv"), 4).alias("total"),
    )


@query(
    "asof_join",
    oracle="""
WITH purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
),
clicks AS (
  SELECT user_id, ts AS c_ts FROM events
  WHERE event_type <> 'purchase' AND ts IS NOT NULL
)
SELECT p.user_id, p.purchase_id, p.p_ts, c.c_ts AS last_click_ts,
       CASE WHEN c.c_ts IS NULL THEN NULL
            ELSE date_diff('second', c.c_ts, p.p_ts) END::BIGINT AS gap_s
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join — the time-series operator Spark has no native form of
    (SURVEY §2.3 lists it absent in the reference too; DuckDB ships it
    as ASOF JOIN, which is the oracle). For every purchase event: the
    NEAREST click of the same user at-or-before it.

    Spark composition (the standard scale pattern): union both sides
    into one ordered stream, run `last(click_ts, ignoreNulls) OVER
    (PARTITION BY key ORDER BY ts, clicks-first ROWS UNBOUNDED
    PRECEDING)`, keep the purchase rows. ONE shuffle on the key — same
    cost as a plain window — where a naive inequality join would be a
    per-user cross product. Clicks sort before purchases at equal ts so
    a same-instant click matches (ASOF's >= semantics).

    NULL event times are filtered on BOTH engines (the repo-wide
    event-time convention): a NULL-ts purchase sorts FIRST in Spark's
    ASC window (no preceding click → NULL match) but LAST in DuckDB's
    ASOF sort (matches the newest click) — divergence caught by the
    fuzz gate (seed 101), whose NULL timestamps land on purchases, a
    combination the curated edge rows didn't cover.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") != "purchase").alias("is_click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_click"), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_last = marked.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("is_click"), F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        with_last.filter(~F.col("is_click"))
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            "last_click_ts",
            F.when(
                F.col("last_click_ts").isNotNull(),
                (
                    F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts")
                ).cast("long"),
            ).alias("gap_s"),
        )
    )


@query(
    "orders_rollup",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (priority → status → grand
    total) — SURVEY §2.4 notes grouping sets are absent in the reference
    and free in Spark; this query makes the claim checkable. One shuffle;
    Spark expands the grouping sets map-side (partial agg per set)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


N_RANGES = 100
RANGE_STEP = 5.0
RANGE_WIDTH = 15.0  # overlapping ×3: value hits ~3 ranges
BUCKET_W = 5.0


@query(
    "range_join",
    oracle=f"""
WITH ranges AS (
  SELECT i AS range_id, i * {RANGE_STEP} AS lo, i * {RANGE_STEP} + {RANGE_WIDTH} AS hi
  FROM generate_series(0, {N_RANGES - 1}) AS g(i)
)
SELECT e.event_id, r.range_id, e.value
FROM events e JOIN ranges r ON e.value >= r.lo AND e.value < r.hi
""",
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join via BUCKETING — the scale pattern for inequality joins
    (Spark's native plan for `v BETWEEN lo AND hi` against a non-tiny
    range table is BroadcastNestedLoop or a cartesian refine: per-row
    scans of every range). Instead: quantize into fixed-width buckets,
    EXPLODE each range onto the buckets it overlaps, equi-join on
    bucket id, refine with the exact predicate. ONE hash shuffle; work
    scales with true overlap density, not |events| × |ranges|.
    Oracle = the plain inequality join (same rows, any plan)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    ranges = spark.range(N_RANGES).select(
        F.col("id").cast("int").alias("range_id"),
        (F.col("id") * RANGE_STEP).alias("lo"),
        (F.col("id") * RANGE_STEP + RANGE_WIDTH).alias("hi"),
    )
    # a range [lo, hi) overlaps buckets floor(lo/w) .. floor(hi/w)
    r_bucketed = ranges.select(
        "range_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / BUCKET_W).cast("int"),
                F.floor(F.col("hi") / BUCKET_W).cast("int"),
            )
        ).alias("bucket"),
    )
    e_bucketed = ev.withColumn(
        "bucket", F.floor(F.col("value") / BUCKET_W).cast("int")
    )
    return (
        e_bucketed.join(r_bucketed, "bucket")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .select("event_id", "range_id", "value")
    )


@query(
    "hypertable_rollup",
    oracle=f"""
SELECT date_trunc('hour', ts) AS bucket_hour, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS total_value,
       -- avg derived from the ROUNDED total: both engines then divide
       -- identical numerators, so no half-boundary straddle from 1-ulp
       -- sum drift (seen at sf0.1: avg(…) landing exactly on …125).
       -- SIGNED helper (half away from zero): an hourly sum of values
       -- may be negative, and the nonneg formula would round it
       -- half-toward-+inf (ADVICE r5); numerator is in 1e4-units, so
       -- scale=100 lands in micro-units.
       ({half_up_scaled_ratio_sql("round(round(sum(value), 4) * 10000)", "count(*)", scale=100)}) / 1000000.0 AS avg_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: time-bucketed (hourly)
    rollup per event type — the materialized-view shape a TSDB keeps
    per hypertable chunk. In Spark the time bucket IS the partition
    key of the rollup table (date partition pruning on reads); the agg
    is one shuffle with map-side partials, and the streaming twin is a
    tumbling-window aggregation over the same expression."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"), "event_type"
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        # signed scaled helper: hourly sums may be negative; 1e4-unit
        # numerator x scale=100 -> micro-units, half away from zero
        (
            half_up_scaled_ratio(
                F.round(F.round(F.sum("value"), 4) * 1e4).cast("long"),
                F.count("*").cast("long"),
                scale=100,
            ).cast("double")
            / 1e6
        ).alias("avg_value"),
    )


@query(
    "rolling_user_stats",
    oracle="""
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       CAST(sum(v) OVER w AS DOUBLE) AS sum_1h
FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE ts IS NOT NULL)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def rolling_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window feature engineering — per event, the user's
    activity count and value sum over the PRECEDING HOUR (range frame,
    not row frame: the window is defined by time distance, and
    same-timestamp peers are all in-frame on both engines). This is the
    rolling-feature shape behind fraud/abuse/engagement features in a
    training pipeline, and the one window type the catalog lacked
    (hypertable_rollup = tumbling, asof_join = point-in-time).

    Cross-engine contract: the frame orders on exact MICROSECOND longs
    (unix_micros / epoch_us — integer on both engines; unix_SECONDS
    would truncate in Spark but round in a DuckDB cast), and the value
    sum runs in DECIMAL(18,2) so no float summation-order drift.

    Scale shape: one shuffle on user_id; within a user the range frame
    is a sliding two-pointer pass over the time-sorted events — O(n)
    per user, no self-join. A whale user is bounded by per-user event
    counts, not corpus size; beyond that the rows-preceding bound is
    the salting story (same two-stage shape as domain_quota)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = ev.select(
        "event_id",
        "user_id",
        # ts may surface as TIMESTAMP_NTZ depending on the writer; the
        # session is pinned UTC (session.py) so the LTZ cast is identity
        # and unix_micros matches DuckDB's epoch_us on the naive value
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum("v").over(w).cast("double").alias("sum_1h"),
    )


_FUNNEL = ("signup", "click", "purchase")

# shared with stream_event_funnel (pipeline_queries) — the drained
# stream twin proves it computes exactly this relational definition
FUNNEL_ORACLE = f"""
WITH s AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{_FUNNEL[0]}' AND ts IS NOT NULL GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s USING (user_id)
  WHERE e.event_type = '{_FUNNEL[1]}' AND e.ts IS NOT NULL
    AND e.ts > s.t1 GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
  WHERE e.event_type = '{_FUNNEL[2]}' AND e.ts IS NOT NULL
    AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT 1::BIGINT AS stage, '{_FUNNEL[0]}' AS event_type,
       (SELECT count(*) FROM s)::BIGINT AS users
UNION ALL
SELECT 2::BIGINT, '{_FUNNEL[1]}', (SELECT count(*) FROM c)::BIGINT
UNION ALL
SELECT 3::BIGINT, '{_FUNNEL[2]}', (SELECT count(*) FROM p)::BIGINT
"""


@query("event_funnel", oracle=FUNNEL_ORACLE)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (signup -> click -> purchase): a user
    reaches stage k+1 at the first stage-(k+1) event STRICTLY AFTER
    their stage-k time. The naive plan is one self-join per stage
    (k passes over events); this runs ONE shuffle total: filter to the
    funnel types, sort each user's events once
    (sort_array(collect_list)), and replay the funnel as a left fold
    over the sorted array — first-signup, then first-later-click, then
    first-later-purchase — which is exactly the min-chain the oracle's
    3-CTE formulation computes. Per-user state is 3 timestamps; the
    fold is codegen array math, no Python, no window function, and the
    per-user event list is session-scale (the same boundedness
    argument as sessionize/pack_sequences)."""
    # ts IS NOT NULL on BOTH engines (the rolling_user_stats
    # convention): without it the oracle's s CTE counts a user whose
    # only signups have NULL ts (min(ts)=NULL still yields a GROUP BY
    # row) while the fold leaves t1 NULL and count("f.t1") excludes
    # them — a NULL-bearing corpus would hash-mismatch (ADVICE r4).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_FUNNEL) & F.col("ts").isNotNull()
    )
    sorted_ev = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    acc0 = F.struct(
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t2"),
        F.lit(None).cast("timestamp").alias("t3"),
    )

    def step(acc, e):
        t1 = F.when(
            acc["t1"].isNull() & (e["event_type"] == _FUNNEL[0]), e["ts"]
        ).otherwise(acc["t1"])
        t2 = F.when(
            acc["t2"].isNull()
            & (e["event_type"] == _FUNNEL[1])
            & acc["t1"].isNotNull()
            & (e["ts"] > acc["t1"]),
            e["ts"],
        ).otherwise(acc["t2"])
        t3 = F.when(
            acc["t3"].isNull()
            & (e["event_type"] == _FUNNEL[2])
            & acc["t2"].isNotNull()
            & (e["ts"] > acc["t2"]),
            e["ts"],
        ).otherwise(acc["t3"])
        return F.struct(t1.alias("t1"), t2.alias("t2"), t3.alias("t3"))

    per_user = (
        ev.groupBy("user_id")
        .agg(sorted_ev.alias("evs"))
        .select(F.aggregate(F.col("evs"), acc0, step).alias("f"))
    )
    counts = per_user.agg(
        F.count("f.t1").alias("n1"),
        F.count("f.t2").alias("n2"),
        F.count("f.t3").alias("n3"),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("stage"),
                F.lit(name).alias("event_type"),
                F.col(f"n{i + 1}").cast("long").alias("users"),
            )
            for i, name in enumerate(_FUNNEL)
        ]
    )
    return counts.select(F.explode(stages).alias("s")).select("s.*")


@query(
    "retention_cohorts",
    oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('day', min(ts))::DATE AS cohort_day
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS active_day
  FROM events
)
SELECT f.cohort_day AS cohort_day,
       date_diff('day', f.cohort_day, a.active_day)::BIGINT AS day_offset,
       count(DISTINCT a.user_id)::BIGINT AS users
FROM active a JOIN first_seen f USING (user_id)
GROUP BY cohort_day, day_offset
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day,
    counted on every later day they were active (day_offset 0 = the
    cohort day itself). The product-analytics staple next to
    sessionize/funnel.

    Scale shape: two aggregations over events (per-user min, distinct
    user-day — both with map-side partial agg) joined on user_id (a
    keyed join of user-sized tables, not event-sized), then a final
    group on (cohort_day, day_offset) whose cardinality is days² —
    tiny. Nothing wider than the user dimension ever shuffles twice,
    and no window function is needed anywhere."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    active = ev.select(
        "user_id", F.to_date("ts").alias("active_day")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("users"))
    )
