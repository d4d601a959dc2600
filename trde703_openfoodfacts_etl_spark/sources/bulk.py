"""Bulk backfill sources: CSV / JSON → CDC envelope.

Parity with the reference's CSV scan (etl/bronze_to_silver.py:40-47:
header, tab separator, quote/escape '\"', multiLine) — retained for initial
loads of historical transcript dumps; the steady state is the WAL tail.

A bulk load is expressed as a single CDC batch of inserts: every row gets
``op='I'`` and a synthetic ``lsn`` derived from the natural key hash —
deterministic across re-runs and partitionings (so a re-applied backfill
no-op-skips) WITHOUT a global sort: a 100 TB backfill must not funnel
through a single-partition ``row_number`` window (the W2 anti-pattern), and
``monotonically_increasing_id`` is partition-dependent. Since the natural
key is unique in a dump and every op is 'I', the lsn never tie-breaks
within a key — it only needs determinism, not density or global order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..schema import TRANSCRIPT_SCHEMA, conform

#: backfill lsns occupy [base_lsn, base_lsn + LSN_SPAN); a live WAL feed
#: applied on top must start at or above base_lsn + LSN_SPAN (the usual
#: snapshot-then-binlog contract: the snapshot owns the low lsn range).
LSN_SPAN = 1 << 40


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

    The lsn is the natural-key hash folded into ``[base_lsn, base_lsn +
    LSN_SPAN)`` — a pure per-row projection, no exchange, no window: the
    plan stays embarrassingly parallel at any dump size. Cross-key lsn
    collisions are harmless (LWW orders events *within* a key; backfill
    keys are unique and all ops are 'I').
    """
    clean = conform(df, TRANSCRIPT_SCHEMA)
    return clean.withColumn(
        "lsn",
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(LSN_SPAN)) + F.lit(base_lsn),
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
