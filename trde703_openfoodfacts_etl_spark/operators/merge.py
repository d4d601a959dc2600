"""Microbatch MERGE: last-writer-wins upsert/delete into the lake table.

The Spark-first lift of the reference's LWW dedup
(etl/bronze_to_silver.py:230-236: ``row_number() OVER (PARTITION BY code
ORDER BY desc(coalesce(last_modified_t,0)))`` keep rn=1), extended from
in-batch dedup to a full cross-batch CDC apply:

- **in-batch LWW** uses ``max_by(struct(payload), struct(ts, lsn))`` under a
  ``groupBy`` rather than a window: Catalyst plans it as a hash aggregate
  with a map-side partial phase, so a hot key (one conversation turn updated
  millions of times) is reduced on every input partition *before* the
  shuffle — the skew-safe equivalent of manual salting, with AQE handling
  residual imbalance. A window would shuffle+sort every event of the hot key
  into a single task.
- **cross-batch merge** unions the winners with the current state of only
  the touched buckets (manifest-pruned read) and re-runs the same LWW
  aggregate — one shuffle, no join, and change detection rides the same
  aggregate (max over current-side hash/tombstone flags), so the whole merge
  is a single exchange.
- **delete semantics**: a winning ``op='D'`` becomes a tombstone
  (``_deleted=true``). Tombstones keep the merge order-independent: a late
  event with a smaller ``(ts, lsn)`` can never resurrect a deleted key, and
  delete + re-insert replays correctly under any batch arrangement.
- **no-op skip**: a row hash (lift of the reference's md5 change hash,
  etl/bronze_to_silver.py:255-263) detects redelivered/unchanged winners;
  buckets where nothing changed are not rewritten — their files carry
  forward in the manifest (copy-on-write at bucket granularity).
- **exactly-once**: the commit records ``batch_id``; a replayed foreachBatch
  epoch (``batch_id <= last committed``) returns without touching data.
- **schema evolution**: the batch schema is diffed against the lake schema
  before the merge; added columns and widened types evolve the manifest
  schema, and both the batch and the current state are conformed to the
  unified schema (typed-null fill / upcast) before the union.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import (
    KEY_COLS,
    META_BUCKET,
    META_DELETED,
    META_LSN,
    META_ROW_HASH,
)
from ..sources.lake import LakeTable, bucket_expr, row_hash_expr

ENVELOPE_COLS = ("op", "lsn", "event_ts")

_TS_FLOOR = "CAST('1970-01-01 00:00:00' AS TIMESTAMP)"


def _order_struct(ts_col, lsn_col):
    """LWW ordering key: (coalesce(ts, epoch), lsn) — the reference's
    desc(coalesce(last_modified_t, 0)) with the WAL position as tiebreaker."""
    return F.struct(
        F.coalesce(ts_col, F.expr(_TS_FLOOR)).alias("o_ts"), lsn_col.alias("o_lsn")
    )


def lww_winners(env_df, payload_cols: list[str]):
    """One surviving event per (conv_id, turn_idx): greatest (ts, lsn).

    Partial-aggregate formulation (module docstring). Exact duplicate
    redeliveries (same lsn) are absorbed: identical order key + payload →
    identical winner either way. Also folds per-key event counts and the
    batch max lsn so downstream metrics need no extra pass.
    """
    nonkey = [c for c in payload_cols if c not in KEY_COLS]
    carried = F.struct(*[F.col(c) for c in nonkey], F.col("op"), F.col("lsn"))
    agg = env_df.groupBy(*KEY_COLS).agg(
        F.max_by(carried, _order_struct(F.col("ts"), F.col("lsn"))).alias("_w"),
        F.count(F.lit(1)).alias("_n_events"),
        F.max("lsn").alias("_batch_max_lsn"),
    )
    return agg.select(
        *KEY_COLS,
        *[F.col(f"_w.{c}").alias(c) for c in nonkey],
        F.col("_w.op").alias("op"),
        F.col("_w.lsn").alias(META_LSN),
        "_n_events",
        "_batch_max_lsn",
    )


def apply_batch(
    lake: LakeTable,
    batch_df,
    batch_id: int,
    stream_id: str = "default",
    files_per_bucket: int = 1,
) -> dict:
    """Apply one CDC microbatch (op, lsn, event_ts + payload) to the lake.

    Idempotent on batch_id; commits one new snapshot atomically; returns the
    batch metrics dict that also lands in the manifest.
    """
    t0 = time.time()
    snap = lake.snapshot()

    # ---- exactly-once guard --------------------------------------------------
    if batch_id <= lake.last_batch_id(stream_id, snap):
        return {
            "batch_id": batch_id,
            "skipped_replay": True,
            "snapshot_id": snap["snapshot_id"],
        }

    # ---- schema evolution: diff incoming payload schema vs lake schema -------
    incoming_user = T.StructType(
        [f for f in batch_df.schema.fields if f.name not in ENVELOPE_COLS]
    )
    snap, unified = lake.evolve_schema(snap, incoming_user)
    payload_cols = [f.name for f in unified.fields]
    nonkey = [c for c in payload_cols if c not in KEY_COLS]
    num_buckets = snap["num_buckets"]

    # ---- quality gate (reference P3: null/empty/sentinel key filter) ---------
    gate = (
        F.col("conv_id").isNotNull()
        & (F.col("conv_id") != "")
        & F.col("turn_idx").isNotNull()
        & F.col("op").isin("I", "U", "D")
    )
    pre = batch_df.select(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(gate, 0).otherwise(1)).alias("n_gated_out"),
    ).first()

    # envelope + payload conformed to the unified schema, one declarative select
    have = set(batch_df.columns)
    env = batch_df.filter(gate).select(
        F.col("op"),
        F.col("lsn").cast("long").alias("lsn"),
        F.col("event_ts"),
        *[
            (F.col(f.name).cast(f.dataType) if f.name in have else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in unified.fields
        ],
    )

    # ---- in-batch LWW ----------------------------------------------------------
    winners = (
        lww_winners(env, payload_cols)
        .withColumn(META_DELETED, F.col("op") == "D")
        .withColumn(
            META_ROW_HASH,
            F.when(F.col("op") == "D", F.lit(None).cast("long")).otherwise(
                row_hash_expr(payload_cols)
            ),
        )
        .withColumn(META_BUCKET, bucket_expr(num_buckets))
        .drop("op")
        .persist()
    )

    touched = sorted(r[0] for r in winners.select(META_BUCKET).distinct().collect())
    if not touched:
        new_snap = lake.commit(
            snap, {}, {}, {}, stream_id, batch_id,
            {"batch_id": batch_id, "events_in": int(pre["n_raw"]), "empty_batch": True},
        )
        winners.unpersist()
        return {
            "batch_id": batch_id,
            "events_in": int(pre["n_raw"]),
            "snapshot_id": new_snap["snapshot_id"],
            "buckets_rewritten": 0,
        }

    # ---- cross-batch merge over touched buckets only (manifest pruning) -------
    state_cols = [*KEY_COLS, *nonkey, META_LSN, META_DELETED, META_ROW_HASH]
    batch_side = winners.select(
        *state_cols, "_n_events", F.lit("new").alias("_src")
    )
    current_side = (
        lake.read(buckets=list(touched), include_deleted=True, with_meta=True, snap=snap)
        .select(*state_cols)
        .withColumn("_n_events", F.lit(0).cast("long"))
        .withColumn("_src", F.lit("cur"))
    )

    carried = F.struct(*[F.col(c) for c in state_cols if c not in KEY_COLS])
    merged = (
        batch_side.unionByName(current_side)
        .groupBy(*KEY_COLS)
        .agg(
            F.max_by(carried, _order_struct(F.col("ts"), F.col(META_LSN))).alias("_w"),
            F.max(F.when(F.col("_src") == "cur", F.col(META_ROW_HASH))).alias("_cur_hash"),
            F.max(
                F.when(F.col("_src") == "cur", F.col(META_DELETED).cast("int"))
            ).alias("_cur_del"),
            F.max((F.col("_src") == "cur").cast("int")).alias("_cur_exists"),
            F.sum("_n_events").alias("_n_events"),
        )
        .select(
            *KEY_COLS,
            *[F.col(f"_w.{c}").alias(c) for c in state_cols if c not in KEY_COLS],
            "_cur_hash",
            "_cur_del",
            "_cur_exists",
            "_n_events",
        )
        .withColumn(META_BUCKET, bucket_expr(num_buckets))
        .withColumn(
            "_changed",
            (F.col("_cur_exists") == 0)
            | ~F.col(META_ROW_HASH).eqNullSafe(F.col("_cur_hash"))
            | (F.col(META_DELETED).cast("int") != F.coalesce(F.col("_cur_del"), F.lit(0))),
        )
        .persist()
    )

    chg = (
        merged.groupBy(META_BUCKET)
        .agg(
            F.sum(F.col("_changed").cast("int")).alias("n_changed"),
            F.sum(F.when(~F.col(META_DELETED), 1).otherwise(0)).alias("live_rows"),
            F.sum(F.when(F.col(META_DELETED), 1).otherwise(0)).alias("tombstones"),
            F.sum("_n_events").alias("n_events"),
        )
        .collect()
    )
    changed_buckets = sorted(int(r[META_BUCKET]) for r in chg if r["n_changed"] > 0)
    bucket_rows = {int(r[META_BUCKET]): int(r["live_rows"]) for r in chg}
    bucket_hwm = {
        int(r[META_BUCKET]): int(r["h"])
        for r in winners.groupBy(META_BUCKET).agg(F.max("_batch_max_lsn").alias("h")).collect()
    }

    # ---- copy-on-write: rewrite only buckets with actual changes ---------------
    replaced: dict[int, list[dict]] = {}
    rows_written = 0
    if changed_buckets:
        to_write = merged.filter(F.col(META_BUCKET).isin(changed_buckets)).select(
            *payload_cols, META_LSN, META_ROW_HASH, META_DELETED, META_BUCKET
        )
        replaced = lake.write_bucket_files(
            to_write, snap["snapshot_id"] + 1, snap["schema_id"], files_per_bucket
        )
        rows_written = sum(fe["rows"] for fs in replaced.values() for fe in fs)

    metrics = {
        "batch_id": batch_id,
        "events_in": int(pre["n_raw"]),
        "gated_out": int(pre["n_gated_out"] or 0),
        "buckets_touched": len(touched),
        "buckets_rewritten": len(changed_buckets),
        "rows_written": int(rows_written),
        "per_bucket_events": {int(r[META_BUCKET]): int(r["n_events"]) for r in chg},
        "wall_sec": round(time.time() - t0, 3),
    }
    metrics["events_per_sec"] = (
        round(metrics["events_in"] / metrics["wall_sec"], 1)
        if metrics["wall_sec"] > 0
        else None
    )
    new_snap = lake.commit(
        snap,
        replaced,
        bucket_hwm,
        {b: bucket_rows[b] for b in changed_buckets},
        stream_id,
        batch_id,
        metrics,
    )
    winners.unpersist()
    merged.unpersist()
    metrics["snapshot_id"] = new_snap["snapshot_id"]
    return metrics
