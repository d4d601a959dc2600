"""Microbatch MERGE: last-writer-wins upsert/delete into the lake table.

The Spark-first lift of the reference's LWW dedup
(etl/bronze_to_silver.py:230-236: ``row_number() OVER (PARTITION BY code
ORDER BY desc(coalesce(last_modified_t,0)))`` keep rn=1), extended from
in-batch dedup to a full cross-batch CDC apply.

Execution design (what survives 100 TB):

1. **LWW as partial aggregation.** ``max_by(struct(payload), struct(ts,
   lsn))`` under ``groupBy`` — Catalyst plans a hash aggregate with a
   map-side partial phase, so a hot key (one turn updated millions of times)
   is reduced on every input partition *before* the shuffle: skew-safe
   without manual salting, AQE mops up residual imbalance. A window
   (`row_number`) would sort every event of the hot key into one task.

2. **Skinny change detection.** Deciding *what changed* never moves the
   payload: a hash-only projection of the batch (key, bucket, order-key,
   row-hash) is merged against a hash-only read of the current state
   (parquet column pruning — the text column is not read). One shuffle of
   ~40 bytes/key instead of the full row. Output: per-bucket changed-row
   counts, live-row counts, and high-watermark LSNs, in one collect.

3. **Copy-on-write restricted to changed buckets.** Only buckets with real
   changes are rewritten (redelivered/no-op batches rewrite nothing — the
   reference's md5 row-hash idea, etl/bronze_to_silver.py:255-263, promoted
   to a no-op skip). The full-payload merge + write materializes exactly
   once; no DataFrame caches (a columnar cache build of wide rows costs
   more than one recompute of a skinny aggregate).

4. **Tombstones.** A winning ``op='D'`` persists as ``_deleted=true``, so a
   late event with a smaller ``(ts, lsn)`` can never resurrect a deleted
   key and delete + re-insert replays correctly under any batch arrangement
   (order-independence = exactly-once under at-least-once delivery).

5. **Exactly-once.** The manifest commit records ``batch_id`` per stream; a
   replayed foreachBatch epoch returns without touching data. Gate metrics
   ride ``observe()`` on the first action — zero extra passes (the
   reference re-scans the full lineage per count, SURVEY.md §2.4 A1).

6. **Schema evolution.** The batch schema diffs against the lake schema
   before the merge; adds/widens evolve the manifest schema and both sides
   conform to the unified schema (typed-null fill / upcast) before union.
"""

from __future__ import annotations

import time

from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import (
    KEY_COLS,
    META_BUCKET,
    META_DELETED,
    META_LSN,
    META_ROW_HASH,
)
from ..sources.lake import LakeTable, SnapshotConflict, bucket_expr, row_hash_expr

ENVELOPE_COLS = ("op", "lsn", "event_ts")

#: COW change-detect shape gate (manifest live+dead rows, known driver-side
#: before any job runs): at or below this, the touched-bucket pre-pass —
#: an extra materialize-the-batch-winners job + collect per batch — costs
#: more than letting the detection job scan every bucket's skinny columns
#: (~30 B/row), so a1 fuses into a2 (r6: one job instead of three per
#: batch; sf1.0-shape replay 12.9 s → 9.5 s). Above it, the pre-pass pays
#: for itself by pruning the state read to touched buckets — the
#: O(changed)-not-O(table) property that matters at thousands of buckets.
#: At the default, the fused path's extra skinny scan is bounded by
#: ~8M × 30 B ≈ 240 MB spread over the cluster; deployments can tune it
#: per-table via this module constant.
FUSED_DETECT_MAX_ROWS = 8_000_000

_TS_FLOOR = "CAST('1970-01-01 00:00:00' AS TIMESTAMP)"


def _order_struct(ts_col, lsn_col):
    """LWW ordering key: (coalesce(ts, epoch), lsn) — the reference's
    desc(coalesce(last_modified_t, 0)) with the WAL position as tiebreaker."""
    return F.struct(
        F.coalesce(ts_col, F.expr(_TS_FLOOR)).alias("o_ts"), lsn_col.alias("o_lsn")
    )


def lww_winners(env_df, payload_cols: list[str]):
    """One surviving event per (conv_id, turn_idx): greatest (ts, lsn).

    Partial-aggregate formulation (module docstring #1). Exact duplicate
    redeliveries (same lsn) are absorbed: identical order key + payload →
    identical winner either way.
    """
    nonkey = [c for c in payload_cols if c not in KEY_COLS]
    carried = F.struct(*[F.col(c) for c in nonkey], F.col("op"), F.col("lsn"))
    agg = env_df.groupBy(*KEY_COLS).agg(
        F.max_by(carried, _order_struct(F.col("ts"), F.col("lsn"))).alias("_w"),
    )
    return agg.select(
        *KEY_COLS,
        *[F.col(f"_w.{c}").alias(c) for c in nonkey],
        F.col("_w.op").alias("op"),
        F.col("_w.lsn").alias(META_LSN),
    )


def apply_batch(
    lake: LakeTable,
    batch_df,
    batch_id: int,
    stream_id: str = "default",
    files_per_bucket: int = 1,
    mode: str = "cow",
    segment_hwm: str | None = None,
    max_commit_retries: int = 3,
) -> dict:
    """Apply one CDC microbatch with optimistic-concurrency retry: if
    another writer wins the manifest CAS, re-read the new head and re-apply
    (the loser's data files are orphans until vacuum). See
    :func:`_apply_batch_once` for the merge itself."""
    for attempt in range(max_commit_retries + 1):
        try:
            return _apply_batch_once(
                lake, batch_df, batch_id, stream_id, files_per_bucket, mode,
                segment_hwm,
            )
        except SnapshotConflict:
            if attempt == max_commit_retries:
                raise
    raise AssertionError("unreachable")


def _batch_watermark(pre) -> float | None:
    """Observed max event ts → unix seconds (UTC; ts is naive/ntz)."""
    import datetime as _dt

    mt = pre.get("max_ts")
    if mt is None:
        return None
    if mt.tzinfo is None:
        mt = mt.replace(tzinfo=_dt.timezone.utc)
    return mt.timestamp()


def _apply_batch_once(
    lake: LakeTable,
    batch_df,
    batch_id: int,
    stream_id: str = "default",
    files_per_bucket: int = 1,
    mode: str = "cow",
    segment_hwm: str | None = None,
) -> dict:
    """Apply one CDC microbatch (op, lsn, event_ts + payload) to the lake.

    Idempotent on batch_id; commits one new snapshot atomically; returns the
    batch metrics dict that also lands in the manifest.

    ``mode``:
    - ``"cow"`` (copy-on-write): merge into the current state and rewrite
      changed buckets. Read-optimized; write amplification ∝ state size.
    - ``"mor"`` (merge-on-read): append the batch's in-batch LWW winners as
      delta files — NO read of current state, NO change detection, write
      ∝ batch size only. Readers resolve LWW on the fly until
      :meth:`LakeTable.compact` folds deltas down. The ingest-optimized
      path for sustained 10^10-event feeds (Hudi/Iceberg-v2 MOR shape).
    """
    t0 = time.time()
    _t = {"start": t0}
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
    num_buckets = snap["num_buckets"]

    # ---- quality gate (reference P3: null/empty/sentinel key filter) ---------
    gate = (
        F.col("conv_id").isNotNull()
        & (F.col("conv_id") != "")
        & F.col("turn_idx").isNotNull()
        & F.col("op").isin("I", "U", "D")
    )
    obs = Observation()
    batch_df = batch_df.observe(
        obs,
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(gate, 0).otherwise(1)).alias("n_gated_out"),
        F.max("lsn").alias("max_lsn"),
        F.max("ts").alias("max_ts"),
    )
    have = set(batch_df.columns)
    env = batch_df.filter(gate).select(
        F.col("op"),
        F.col("lsn").cast("long").alias("lsn"),
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in have
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in unified.fields
        ],
    )

    def _obs_pre():
        try:
            return obs.get
        except Exception:
            # an empty batch runs zero tasks → no observed-metrics row; fall
            # back to a direct (trivial) count
            return {"n_raw": batch_df.count(), "n_gated_out": 0, "max_lsn": 0, "max_ts": None}

    def _commit_empty(pre):
        new_snap = lake.commit(
            snap, {}, {}, {}, stream_id, batch_id,
            {"batch_id": batch_id, "events_in": int(pre["n_raw"]), "empty_batch": True},
            stream_hwm=segment_hwm, watermark_ts=_batch_watermark(pre),
        )
        return {
            "batch_id": batch_id,
            "events_in": int(pre["n_raw"]),
            "snapshot_id": new_snap["snapshot_id"],
            "buckets_rewritten": 0,
        }

    _t["plan"] = time.time()

    # ---- MOR fast path: append in-batch winners as delta files ---------------
    # One Spark job total: the winners write IS the first action (no separate
    # touched-buckets scan — write_bucket_files already reports the buckets
    # it produced, which is exactly the touched set after LWW). ONE shuffle
    # total: the batch is repartitioned by bucket up front (bucket is a
    # function of conv_id, so adding it to the LWW groupBy changes no
    # group), the aggregate reuses that exchange (subset rule) and the
    # bucket-partitioned write needs no further shuffle — the previous
    # lww_winners-then-repartition form shuffled the winners a second time
    # just to lay them out by bucket.
    if mode == "mor":
        nonkey_m = [c for c in payload_cols if c not in KEY_COLS]
        carried_m = F.struct(*[F.col(c) for c in nonkey_m], F.col("op"), F.col("lsn"))
        env_b = env.withColumn(META_BUCKET, bucket_expr(num_buckets)).repartition(
            *(
                [F.col(META_BUCKET)]
                if files_per_bucket <= 1
                else [F.col(META_BUCKET), F.col("conv_id")]
            )
        )
        winners = (
            env_b.groupBy(META_BUCKET, *KEY_COLS)
            .agg(
                F.max_by(carried_m, _order_struct(F.col("ts"), F.col("lsn"))).alias("_w")
            )
            .select(
                META_BUCKET,
                *KEY_COLS,
                *[F.col(f"_w.{c}").alias(c) for c in nonkey_m],
                F.col("_w.op").alias("op"),
                F.col("_w.lsn").alias(META_LSN),
            )
            .withColumn(META_DELETED, F.col("op") == "D")
            .withColumn(
                META_ROW_HASH,
                F.when(F.col("op") == "D", F.lit(None).cast("long")).otherwise(
                    row_hash_expr(payload_cols)
                ),
            )
            .drop("op")
        )
        replaced = lake.write_bucket_files(
            winners, snap["snapshot_id"] + 1, snap["schema_id"], files_per_bucket,
            pre_partitioned=True,
        )
        pre = _obs_pre()
        _t["delta_write"] = time.time()
        if not replaced:
            return _commit_empty(pre)
        rows_written = sum(fe["rows"] for fs in replaced.values() for fe in fs)
        hwm = int(pre["max_lsn"] or 0)
        metrics = {
            "batch_id": batch_id,
            "mode": "mor",
            "events_in": int(pre["n_raw"]),
            "gated_out": int(pre["n_gated_out"] or 0),
            "buckets_touched": len(replaced),
            "delta_files": sum(len(fs) for fs in replaced.values()),
            "rows_written": int(rows_written),
            "wall_sec": round(time.time() - t0, 3),
            "phase_sec": {
                _pk[i]: round(_t[_pk[i]] - _t[_pk[i - 1]], 3)
                for _pk in [list(_t)]
                for i in range(1, len(_pk))
            },
        }
        metrics["events_per_sec"] = (
            round(metrics["events_in"] / metrics["wall_sec"], 1)
            if metrics["wall_sec"] > 0
            else None
        )
        new_snap = lake.commit(
            snap, replaced, {b: hwm for b in replaced}, {}, stream_id, batch_id,
            metrics, append=True, stream_hwm=segment_hwm,
            watermark_ts=_batch_watermark(pre),
        )
        _t["commit"] = time.time()
        ks = list(_t)
        metrics["phase_sec"] = dict(
            metrics["phase_sec"], commit=round(_t["commit"] - _t[ks[-2]], 3)
        )
        metrics["snapshot_id"] = new_snap["snapshot_id"]
        return metrics

    # ---- action 1 (COW only): skinny in-batch LWW pre-aggregate --------------
    # ONE narrow scan of the batch serves BOTH the touched-bucket set and the
    # change detection: the per-key in-batch winner (row-hash, tombstone flag,
    # order key — ~40 bytes/key, never the payload). COW thus scans the batch
    # exactly twice end-to-end: here (skinny) and in action 3 (payload). LWW
    # is associative, so pre-deduping the batch then merging with state is
    # identical to merging raw events; map-side partial aggregation reduces
    # hot keys before the exchange either way.
    #
    # TWO execution shapes, chosen from manifest stats BEFORE any job runs:
    # - small table (≤ FUSED_DETECT_MAX_ROWS live+dead rows): the touched-
    #   bucket pre-pass job would cost more than just scanning every
    #   bucket's skinny columns, so the batch aggregate feeds the change-
    #   detection job DIRECTLY (no checkpoint, no extra action) and the
    #   touched set falls out of the same collect (buckets with batch
    #   events). One Spark job for a1+a2 instead of three.
    # - large table: materialize the batch winners (eager localCheckpoint),
    #   collect their buckets, and prune the state read to exactly the
    #   touched buckets — the O(changed)-not-O(table) path that matters at
    #   thousands of buckets.
    # physical file rows (per-file parquet footer counts carried in the
    # manifest) — exactly what the fused skinny scan would read; bucket-
    # level "rows" can be None for as-yet-uncompacted MOR delta buckets
    total_state_rows = sum(
        int(fe.get("rows") or 0)
        for b in snap["buckets"].values()
        for fe in b["files"]
    )
    fused = total_state_rows <= FUSED_DETECT_MAX_ROWS
    sk_rows = env.select(
        *KEY_COLS,
        F.when(F.col("op") == "D", F.lit(None).cast("long"))
        .otherwise(row_hash_expr(payload_cols))
        .alias("_h"),
        (F.col("op") == "D").alias("_d"),
        F.coalesce(F.col("ts"), F.expr(_TS_FLOOR)).alias("_ts"),
        F.col("lsn").alias("_lsn_w"),
        F.lit(1).cast("long").alias("_n_events"),
        F.col("lsn").alias("_max_lsn"),
        F.lit("new").alias("_src"),
    )
    if fused:
        # RAW batch rows feed the detection aggregate directly: a per-key
        # pre-aggregate here would shuffle the batch by key only for the
        # union to erase the partitioning and shuffle it by the same key
        # again (LWW is associative, so one aggregate over raw∪state rows
        # is identical; map-side partials still reduce hot keys)
        sk_batch = sk_rows
        read_buckets = None
        touched: list[int] = []  # derived from the detection collect below
    else:
        sk_batch = (
            sk_rows.groupBy(*KEY_COLS)
            .agg(
                F.max_by(
                    F.struct("_h", "_d", "_ts", "_lsn_w"),
                    F.struct(F.col("_ts"), F.col("_lsn_w")),
                ).alias("_w"),
                F.sum("_n_events").alias("_n_events"),
                F.max("_max_lsn").alias("_max_lsn"),
            )
            .select(
                *KEY_COLS,
                F.col("_w._h").alias("_h"),
                F.col("_w._d").alias("_d"),
                F.col("_w._ts").alias("_ts"),
                F.col("_w._lsn_w").alias("_lsn_w"),
                "_n_events",
                "_max_lsn",
                F.lit("new").alias("_src"),
            )
            .localCheckpoint(eager=True)
        )
        pre = _obs_pre()
        touched = sorted(
            int(r[0])
            for r in sk_batch.select(bucket_expr(num_buckets).alias(META_BUCKET))
            .distinct()
            .collect()
        )
        _t["a1_touched"] = time.time()
        if not touched:
            return _commit_empty(pre)
        read_buckets = list(touched)

    # ---- action 2: skinny change detection (hash-only, no payload moves) -----
    # Batch winners union current state (touched buckets only on the large-
    # table path) → one LWW aggregate; output: per-bucket changed/live/dead
    # counts + HWMs.
    sk_cur = (
        lake.read(buckets=read_buckets, include_deleted=True, with_meta=True, snap=snap)
        .select(
            *KEY_COLS,
            F.col(META_ROW_HASH).alias("_h"),
            F.col(META_DELETED).alias("_d"),
            F.coalesce(F.col("ts"), F.expr(_TS_FLOOR)).alias("_ts"),
            F.col(META_LSN).alias("_lsn_w"),
            F.lit(0).cast("long").alias("_n_events"),
            F.lit(None).cast("long").alias("_max_lsn"),
            F.lit("cur").alias("_src"),
        )
    )
    sk = (
        sk_batch.unionByName(sk_cur)
        .groupBy(*KEY_COLS)
        .agg(
            F.max_by(
                F.struct(F.col("_h").alias("h"), F.col("_d").alias("d")),
                F.struct(F.col("_ts"), F.col("_lsn_w")),
            ).alias("_w"),
            F.max(F.when(F.col("_src") == "cur", F.col("_h"))).alias("_cur_h"),
            F.max(F.when(F.col("_src") == "cur", F.col("_d").cast("int"))).alias("_cur_d"),
            F.max((F.col("_src") == "cur").cast("int")).alias("_cur_exists"),
            F.sum("_n_events").alias("_n_events"),
            F.max("_max_lsn").alias("_max_lsn"),
        )
        .select(
            bucket_expr(num_buckets).alias(META_BUCKET),
            (
                (F.col("_cur_exists") == 0)
                | ~F.col("_w.h").eqNullSafe(F.col("_cur_h"))
                | (F.col("_w.d").cast("int") != F.coalesce(F.col("_cur_d"), F.lit(0)))
            ).alias("_changed"),
            F.col("_w.d").alias("_del"),
            "_n_events",
            "_max_lsn",
        )
        .groupBy(META_BUCKET)
        .agg(
            F.sum(F.col("_changed").cast("int")).alias("n_changed"),
            F.sum(F.when(~F.col("_del"), 1).otherwise(0)).alias("live_rows"),
            F.sum(F.when(F.col("_del"), 1).otherwise(0)).alias("dead_rows"),
            F.sum("_n_events").alias("n_events"),
            F.max("_max_lsn").alias("hwm"),
        )
        .collect()
    )
    _t["a2_skinny"] = time.time()
    if fused:
        # the touched set falls out of the same collect: buckets that saw
        # ≥1 batch event (untouched buckets appear too — state-only rows —
        # with n_events = 0 and n_changed = 0)
        pre = _obs_pre()
        touched = sorted(int(r[META_BUCKET]) for r in sk if r["n_events"] > 0)
        sk = [r for r in sk if r["n_events"] > 0]
        if not touched:
            return _commit_empty(pre)
    changed_buckets = sorted(int(r[META_BUCKET]) for r in sk if r["n_changed"] > 0)
    bucket_rows = {int(r[META_BUCKET]): int(r["live_rows"]) for r in sk}
    bucket_dead = {int(r[META_BUCKET]): int(r["dead_rows"]) for r in sk}
    bucket_hwm = {int(r[META_BUCKET]): int(r["hwm"]) for r in sk if r["hwm"] is not None}

    # ---- action 3: full-payload merge + write, changed buckets only ----------
    # ONE payload shuffle end-to-end: raw batch events union current state,
    # repartitioned by the bucket column. HashPartitioning(_bucket) satisfies
    # the ClusteredDistribution of groupBy(_bucket, conv_id, turn_idx)
    # (subset rule), so the LWW aggregate reuses that exchange, its output
    # stays bucket-clustered, and the partitioned write needs no further
    # shuffle. With files_per_bucket == 1 the partitioning is _bucket ALONE:
    # each bucket lands in exactly one task, so the dynamic-partition writer
    # emits exactly one file per bucket — partitioning by (_bucket, conv_id)
    # here spread every bucket over every shuffle task and each task wrote
    # its own file per bucket (~tasks × buckets tiny files per epoch; the
    # next batch then re-read them all and the driver footer-stat'ed each —
    # the guide §6 small-files trap, measured at 13 files/bucket/epoch and
    # a3_write 6.5 s for a 200k-row table). A hot bucket is one task, the
    # same unit compact()/rebucket() already use; within-bucket skew across
    # keys is still absorbed by map-side partial aggregation, and bucket
    # count evolution (maybe_rebucket) is the scale lever. Callers that ask
    # for files_per_bucket > 1 keep the conv_id spread — they explicitly
    # want multiple writer tasks per bucket.
    replaced: dict[int, list[dict]] = {}
    rows_written = 0
    if changed_buckets:
        nonkey = [c for c in payload_cols if c not in KEY_COLS]
        state_nonkey = [*nonkey, META_LSN, META_DELETED, META_ROW_HASH]
        in_changed = bucket_expr(num_buckets).isin([int(b) for b in changed_buckets])
        batch_side = env.filter(in_changed).select(
            *KEY_COLS,
            *nonkey,
            F.col("lsn").alias(META_LSN),
            (F.col("op") == "D").alias(META_DELETED),
            F.when(F.col("op") == "D", F.lit(None).cast("long"))
            .otherwise(row_hash_expr(payload_cols))
            .alias(META_ROW_HASH),
        )
        current_side = lake.read(
            buckets=list(changed_buckets), include_deleted=True, with_meta=True, snap=snap
        ).select(*batch_side.columns)
        carried = F.struct(*[F.col(c) for c in state_nonkey])
        merged = (
            batch_side.unionByName(current_side)
            .withColumn(META_BUCKET, bucket_expr(num_buckets))
            .repartition(
                *(
                    [F.col(META_BUCKET)]
                    if files_per_bucket <= 1
                    else [F.col(META_BUCKET), F.col("conv_id")]
                )
            )
            .groupBy(META_BUCKET, *KEY_COLS)
            .agg(
                F.max_by(carried, _order_struct(F.col("ts"), F.col(META_LSN))).alias("_w")
            )
            .select(
                META_BUCKET,
                *KEY_COLS,
                *[F.col(f"_w.{c}").alias(c) for c in state_nonkey],
            )
        )
        replaced = lake.write_bucket_files(
            merged, snap["snapshot_id"] + 1, snap["schema_id"], files_per_bucket,
            pre_partitioned=True,
        )
        rows_written = sum(fe["rows"] for fs in replaced.values() for fe in fs)
    _t["a3_write"] = time.time()

    metrics = {
        "batch_id": batch_id,
        "events_in": int(pre["n_raw"]),
        "gated_out": int(pre["n_gated_out"] or 0),
        "buckets_touched": len(touched),
        "buckets_rewritten": len(changed_buckets),
        "rows_written": int(rows_written),
        "per_bucket_events": {int(r[META_BUCKET]): int(r["n_events"]) for r in sk},
        "wall_sec": round(time.time() - t0, 3),
        # pre-commit phases land IN the manifest (post-hoc regression
        # attribution from committed metrics); the commit duration itself is
        # appended to the returned dict after the commit completes
        "phase_sec": {
            _pk[i]: round(_t[_pk[i]] - _t[_pk[i - 1]], 3)
            for _pk in [list(_t)]
            for i in range(1, len(_pk))
        },
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
        stream_hwm=segment_hwm,
        watermark_ts=_batch_watermark(pre),
        bucket_tombstones={b: bucket_dead[b] for b in changed_buckets},
    )
    _t["commit"] = time.time()
    ks = list(_t)
    metrics["phase_sec"] = dict(
        metrics["phase_sec"], commit=round(_t["commit"] - _t[ks[-2]], 3)
    )
    metrics["snapshot_id"] = new_snap["snapshot_id"]
    return metrics
