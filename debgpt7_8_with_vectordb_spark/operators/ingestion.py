"""Message-ingestion stamping — F11 (uuid row ids) + F12 (epoch-seconds
default) from SURVEY §2.8.

The reference mints both per saved message (vector_service/app.py:199-200:
``timestamp = msg.timestamp or int(time.time())`` then
``message_id = str(uuid.uuid4())``) inside its REST handler, one row at a
time. Spark-first re-expression: both stamps are Catalyst expressions —
``uuid()`` (per-row v4, JVM-side, whole-stage codegen) and
``unix_timestamp()`` (epoch seconds, evaluated once per query per Spark's
now()-stability contract, which is exactly the batch semantics you want:
every row of one ingest batch shares the arrival second) — so a 100 TB
ingest stamps ids scan-parallel with zero Python and zero shuffle.

Determinism note: ``uuid()`` is nondeterministic BY NATURE (that is its
job), so the catalog validates it structurally (format / uniqueness /
version-4 bits) rather than by value — the driver contract's oracle
compares those deterministic aggregates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# RFC 4122 v4: version nibble '4', variant nibble in [89ab]
UUID4_RE = (
    "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
)


def stamp_ingestion_ids(
    df: DataFrame,
    id_col: str = "msg_id",
    ts_col: str = "created_ts",
    supplied_ts: str | None = None,
) -> DataFrame:
    """Add the two ingestion stamps every saved message gets:

    - ``id_col``: a fresh uuid4 string per row (reference app.py:200);
    - ``ts_col``: epoch seconds — the caller-supplied column when
      present and non-zero, else "now". The reference's
      ``msg.timestamp or int(time.time())`` treats BOTH null and 0 as
      missing (Python falsiness), so the parity expression is
      ``coalesce(nullif(supplied, 0), unix_timestamp())``, not a plain
      coalesce.
    """
    now = F.unix_timestamp().cast("long")
    if supplied_ts is not None:
        ts = F.coalesce(
            F.nullif(F.col(supplied_ts).cast("long"), F.lit(0)), now
        )
    else:
        ts = now
    return df.withColumn(id_col, F.expr("uuid()")).withColumn(ts_col, ts)
