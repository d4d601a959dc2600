"""Bulk backfill sources: CSV / JSON → CDC envelope.

Parity with the reference's CSV scan (etl/bronze_to_silver.py:40-47:
header, tab separator, quote/escape '\"', multiLine) — retained for initial
loads of historical transcript dumps; the steady state is the WAL tail.

A bulk load is expressed as a single CDC batch of inserts: every row gets
``op='I'`` and a synthetic monotone ``lsn`` (file-order row number via
``monotonically_increasing_id`` is NOT used — it is partition-dependent;
instead lsn derives from a stable hash ordering so re-running the backfill
is deterministic and idempotent under the row-hash no-op skip).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..schema import TRANSCRIPT_SCHEMA, conform


def read_csv_dump(spark, path: str, schema=None, sep: str = "\t", multiline: bool = True):
    """Reference-shaped CSV read (S1): explicit schema, never inferSchema."""
    reader = (
        spark.read.option("header", "true")
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .option("encoding", "UTF-8")
        .option("multiLine", "true" if multiline else "false")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json_dump(spark, path: str, schema=None):
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def as_backfill_batch(df, base_lsn: int = 0):
    """Wrap a raw transcript dump in the CDC envelope as one insert batch.

    The lsn must be deterministic across re-runs and partitionings (so a
    re-applied backfill no-op-skips): rank by the natural key, which is
    unique post-dedup. Note the global window here is acceptable ONLY for
    backfill (one-time, and Spark's range-partitioned sort distributes it);
    the hot path never does this (SURVEY W2 anti-pattern avoided elsewhere).
    """
    clean = conform(df, TRANSCRIPT_SCHEMA)
    w = W.orderBy("conv_id", "turn_idx")
    return clean.withColumn(
        "lsn", F.row_number().over(w).cast("long") + F.lit(base_lsn)
    ).select(
        F.lit("I").alias("op"),
        "lsn",
        F.col("ts").alias("event_ts"),
        *[f.name for f in TRANSCRIPT_SCHEMA.fields],
    )


def backfill(lake, df, batch_id: int, stream_id: str = "backfill", base_lsn: int = 0):
    """Load a bulk dump into the lake as one idempotent CDC batch."""
    from ..operators.merge import apply_batch

    return apply_batch(lake, as_backfill_batch(df, base_lsn), batch_id, stream_id=stream_id)
