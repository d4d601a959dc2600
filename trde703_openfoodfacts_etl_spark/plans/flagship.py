"""Flagship query: the real CDC engine driven by the driver's `events` table.

Maps the generic event stream onto the transcript CDC envelope
(conv_id=user_id, turn_idx=event_id%50 → repeated keys = updates;
event_type='error' → delete), replays it through the actual lake MERGE in
three microbatches, and returns the final table state. The DuckDB oracle is
the naive single-pass LWW materialization of the same mapping — so the
driver's correctness gate exercises the full engine (lake format, LWW merge,
tombstones, exactly-once commits), not a lookalike query.

LWW is order-independent, so an arbitrary 3-way split into batches must
converge to the same state — which is precisely what the oracle checks.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "_scratch")

EVENT_LAKE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def _as_cdc(events_df):
    return events_df.select(
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("event_id").alias("lsn"),
        F.col("ts").cast("timestamp").alias("event_ts"),
        F.col("user_id").cast("string").alias("conv_id"),
        F.pmod(F.col("event_id"), F.lit(50)).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.col("ts").cast("timestamp").alias("ts"),
    )


def cdc_replay(spark, sf_dir: str, n_batches: int = 3):
    """Replay sf_dir/events.parquet through the lake engine; return final state."""
    from ..operators.merge import apply_batch
    from ..sources.lake import LakeTable

    os.makedirs(SCRATCH, exist_ok=True)
    root = tempfile.mkdtemp(prefix="cdc_replay_", dir=SCRATCH)
    lake = LakeTable.create(spark, root, EVENT_LAKE_SCHEMA, num_buckets=8)
    ev = _as_cdc(spark.read.parquet(f"{sf_dir}/events.parquet"))
    # contiguous lsn ranges, not pmod: each batch's scan prunes parquet row
    # groups via event_id min/max stats instead of re-reading the whole file
    # per batch (LWW is order-independent, so any split converges). The
    # bounds probe reads one column.
    lo, hi = ev.agg(F.min("lsn"), F.max("lsn")).first()
    step = (int(hi) - int(lo)) // n_batches + 1
    for i in range(n_batches):
        lo_i, hi_i = int(lo) + i * step, int(lo) + (i + 1) * step
        apply_batch(
            lake, ev.filter((F.col("lsn") >= lo_i) & (F.col("lsn") < hi_i)), i
        )
    return lake.read().select("conv_id", "turn_idx", "role", "text", "ts")


SQL_CDC_REPLAY = """
WITH ev AS (
    SELECT CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           event_id AS lsn,
           CAST(user_id AS VARCHAR) AS conv_id,
           CAST(event_id % 50 AS INT) AS turn_idx,
           event_type AS role, props AS text, ts
    FROM events),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY coalesce(ts, TIMESTAMP '1970-01-01') DESC, lsn DESC) AS rn
    FROM ev)
SELECT conv_id, turn_idx, role, text, ts
FROM r WHERE rn = 1 AND op <> 'D'
"""
