#!/usr/bin/env python
"""Large-scale maintained MOR replay (VERDICT r3 item 7: push past 100M).

Replays --events change events (default 300M — the largest WAL + lake +
oracle that fits this sandbox's disk) through the MOR write path WITH the
full maintenance loop engaged (auto-compaction per-batch threshold +
periodic snapshot vacuum), and reports:

- per-batch sustained events/sec, with first-K vs last-K batch medians —
  the MOR claim is that per-batch cost is TABLE-SIZE-INDEPENDENT, so the
  rate must be flat across the run (~±10%) even as the table grows 30x;
- the 4-component state signature (row count, distinct conversations,
  total text chars, turn-index sum) vs an independent DuckDB LWW oracle
  over the same WAL — exact equality required.

Batches are driven one at a time through run_incremental's watermark resume
(max_batches=1), so each batch's wall clock includes exactly its share of
maintenance work; vacuum runs every 4th batch like the round-3 100M config.

Run:  python scripts/bigrun.py [--events 300000000] [--batch-events 10000000]
Writes BENCH/bigrun_{events}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


#: single-scalar LWW ordering key — (ts DESC, lsn DESC) packed into one
#: HUGEINT so the oracle can use arg_max (hash aggregate, spillable) instead
#: of a row_number window: a window sort over 300M ~300-byte rows exceeds
#: RAM and killed the first 300M oracle attempt. lsn < 10^12 by construction.
_LWW_KEY = (
    "CAST(epoch_us(coalesce(ts, TIMESTAMP '1970-01-01')) AS HUGEINT)"
    " * 1000000000000 + lsn"
)


def duckdb_signature(wal: str, evolved: bool = False) -> list[int]:
    """Independent 4-component LWW state signature over the raw WAL
    (6-component when the feed carries the v2 evolution: + non-null
    tool_meta count and total tool_meta chars — NULL for v1-era winners,
    exactly what the lake's typed-null backfill must produce).

    arg_max-per-key formulation (proven equal to the row_number window
    oracle on smaller WALs) with bounded memory + disk spill so it
    completes at any event count this sandbox's disk can hold.

    NULL-safety: DuckDB's ``arg_max(col, key)`` SKIPS rows whose arg is
    NULL, silently substituting an OLDER row's value when the true LWW
    winner carries NULL in that column — exactly what happens to
    ``tool_meta`` on keys whose winner predates the v2 cutover. (Found when
    the engine's 6-component signature disagreed with the first oracle
    formulation at 100M; the engine was right.) Nullable winner columns are
    therefore coalesced to a sentinel (``chr(1)`` — cannot occur in the
    generated text) before arg_max and nullif'd back after. A struct-packed
    single arg_max would be cleaner but its aggregate state OOM-killed the
    100M run; the per-column form is the one proven to 300M.
    """
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads=24")
    con.execute("SET memory_limit='42GB'")
    os.makedirs(os.path.join(REPO, "_scratch", "duckdb_tmp"), exist_ok=True)
    con.execute(f"SET temp_directory='{os.path.join(REPO, '_scratch', 'duckdb_tmp')}'")
    meta_sel = (
        f", nullif(arg_max(coalesce(tool_meta, chr(1)), {_LWW_KEY}), chr(1)) AS tool_meta"
        if evolved
        else ""
    )
    meta_out = (
        ", CAST(count(tool_meta) AS BIGINT),"
        " CAST(coalesce(sum(length(tool_meta)), 0) AS BIGINT)"
        if evolved
        else ""
    )
    q = f"""
        WITH w AS (
            SELECT conv_id, turn_idx,
                   arg_max(op, {_LWW_KEY}) AS op,
                   nullif(arg_max(coalesce(text, chr(1)), {_LWW_KEY}), chr(1)) AS text
                   {meta_sel}
            FROM read_parquet('{wal}/segment=*/*.parquet', union_by_name=true)
            WHERE conv_id IS NOT NULL AND conv_id <> '' AND turn_idx IS NOT NULL
            GROUP BY conv_id, turn_idx)
        SELECT count(*), count(DISTINCT conv_id),
               CAST(sum(length(text)) AS BIGINT),
               CAST(sum(turn_idx) AS BIGINT){meta_out}
        FROM w WHERE op <> 'D'
    """
    return [int(x) for x in con.sql(q).fetchone()]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=300_000_000)
    ap.add_argument("--batch-events", type=int, default=10_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--keep-wal", action="store_true")
    ap.add_argument("--vacuum-every", type=int, default=4)
    ap.add_argument("--purge-consumed", action="store_true",
                    help="delete WAL segment files once applied (binlog "
                         "retention, the real-CDC disposal pattern) — frees "
                         "the feed's disk as the lake grows, which is what "
                         "lets 300M fit this sandbox; the DuckDB oracle is "
                         "computed BEFORE ingest since the WAL won't exist "
                         "after")
    ap.add_argument("--keep-snapshots", type=int, default=4)
    ap.add_argument("--auto-rebucket-bytes", type=int, default=None,
                    help="run the maybe_rebucket growth policy after every "
                         "batch with this mean-bytes-per-occupied-bucket "
                         "target: start the table small-bucketed and let "
                         "the layout grow unattended as it fills (records "
                         "bucket_history + rebucket walls in the output)")
    ap.add_argument("--evolve-at-segment", type=int, default=None,
                    help="segments >= this index carry the v2 schema "
                         "(tool_meta added, turn_idx widened int32->int64): "
                         "exercises live schema evolution mid-run at bench "
                         "scale; the signature gains 2 tool_meta components")
    args = ap.parse_args()

    from trde703_openfoodfacts_etl_spark import build_session
    from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
    from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments_spark
    from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import run_incremental

    n_batches = args.events // args.batch_events
    scratch = os.path.join(REPO, "_scratch", "bigrun")
    evo_tag = f"_evo{args.evolve_at_segment}" if args.evolve_at_segment is not None else ""
    if args.auto_rebucket_bytes is not None:
        evo_tag += "_autorb"
    wal = os.path.join(scratch, f"wal_{args.events}{evo_tag}")
    lake_dir = os.path.join(scratch, f"lake_{args.events}{evo_tag}")
    shutil.rmtree(lake_dir, ignore_errors=True)

    spark = build_session(app_name="bigrun", cores=32, shuffle_partitions=64)
    if not os.path.exists(os.path.join(wal, "_SUCCESS")):
        shutil.rmtree(wal, ignore_errors=True)
        t0 = time.time()
        generate_segments_spark(
            spark, wal,
            n_events=args.events,
            n_convs=max(1000, args.events // 100),
            n_segments=n_batches,
            v2_from_segment=args.evolve_at_segment,
        )
        print(f"WAL generated: {args.events:,} events in {time.time()-t0:.0f}s",
              flush=True)

    lake = LakeTable.create(spark, lake_dir, TRANSCRIPT_SCHEMA,
                            num_buckets=args.buckets)
    # Batch by FILE count, not by segment-dir count: the partitioned WAL
    # write produces multiple part-files per segment dir, and an
    # iteration-count loop over segments_per_batch=1 silently ingests only
    # the first n_batches FILES — exactly the half-feed under-ingest that
    # invalidated the first 300M attempt (engine was fine; this driver
    # wasn't). Drain until run_incremental reports the WAL empty.
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import list_segments

    n_files = len(list_segments(wal))
    per_batch = max(1, (n_files + n_batches - 1) // n_batches)

    oracle_sig = None
    oracle_sec = None
    evolved = args.evolve_at_segment is not None
    if args.purge_consumed:
        t0 = time.time()
        oracle_sig = duckdb_signature(wal, evolved=evolved)
        oracle_sec = time.time() - t0
        print("oracle signature (pre-ingest):", oracle_sig,
              f"({oracle_sec:.0f}s)", flush=True)
        # once purging starts the WAL is no longer the full feed: drop the
        # generation marker NOW so a rerun after a mid-ingest crash
        # regenerates instead of silently replaying the surviving half and
        # labeling the record with the full event count (both sides would
        # agree on the truncated feed, so the signature gate alone cannot
        # catch that)
        marker = os.path.join(wal, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)

    batch_walls: list[float] = []
    vacuum_secs: list[float] = []
    bucket_history: list[int] = []
    rebucket_secs: list[float] = []
    t_run = time.time()
    i = 0
    while True:
        t0 = time.time()
        m = run_incremental(
            lake, wal, segments_per_batch=per_batch, max_batches=1, mode="mor",
            auto_compact_after=6,
        )
        if not m:
            break
        wall = time.time() - t0
        batch_walls.append(wall)
        if args.auto_rebucket_bytes is not None:
            tr = time.time()
            grew = lake.maybe_rebucket(target_bucket_bytes=args.auto_rebucket_bytes)
            if grew is not None:
                rebucket_secs.append(round(time.time() - tr, 1))
                print(f"  rebucket -> {grew['num_buckets']} buckets "
                      f"({rebucket_secs[-1]}s)", flush=True)
        bucket_history.append(int(lake.snapshot()["num_buckets"]))
        if args.purge_consumed:
            from trde703_openfoodfacts_etl_spark.streaming.pipeline import (
                _natural_key,
            )

            hwm = _natural_key(lake.last_segment_hwm("default"))
            for p in list_segments(wal):
                if _natural_key(os.path.relpath(p, wal)) <= hwm:
                    os.remove(p)
        i += 1
        if i % args.vacuum_every == 0:
            tv = time.time()
            lake.vacuum(keep_snapshots=args.keep_snapshots)
            vacuum_secs.append(round(time.time() - tv, 1))
            # Long-lived driver, hundreds of jobs: shuffle files are only
            # deleted when ContextCleaner sees their ShuffleDependency
            # GC'd, and an idle-heap JVM may not GC for the whole run —
            # observed 42 GB of dead blockmgr shuffle data by batch 24,
            # which is what actually filled the disk on the failed 300M
            # attempts. Nudge the driver JVM so completed batches' shuffle
            # output is reclaimed on the vacuum cadence.
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        print(f"batch {i}/{n_batches}: {wall:.1f}s "
              f"({args.batch_events / wall:,.0f} ev/s)", flush=True)
    ingest_wall = time.time() - t_run

    t0 = time.time()
    lake.compact()
    compact_sec = time.time() - t0

    k = max(1, min(10, len(batch_walls) // 3))
    first_k = statistics.median(batch_walls[:k])
    last_k = statistics.median(batch_walls[-k:])

    # engine signature
    from siglib import engine_signature

    engine_sig = engine_signature(lake, evolved=evolved)
    print("engine signature:", engine_sig, flush=True)

    # independent DuckDB LWW oracle over the raw WAL (already computed
    # pre-ingest when the WAL is purged as it is consumed)
    if oracle_sig is None:
        t0 = time.time()
        oracle_sig = duckdb_signature(wal, evolved=evolved)
        oracle_sec = time.time() - t0
    print("oracle signature:", oracle_sig, f"({oracle_sec:.0f}s)", flush=True)

    out = {
        "events": args.events,
        "batches": len(batch_walls),
        "batch_events": args.batch_events,
        "buckets": args.buckets,
        "evolve_at_segment": args.evolve_at_segment,
        "ingest_wall_sec": round(ingest_wall, 1),
        "sustained_events_per_sec": round(args.events / ingest_wall, 0),
        "batch_walls": [round(w, 1) for w in batch_walls],
        "first10_median_wall": round(first_k, 1),
        "last10_median_wall": round(last_k, 1),
        "flatness_last_over_first": round(last_k / first_k, 3),
        "vacuum_secs": vacuum_secs,
        "auto_rebucket_bytes": args.auto_rebucket_bytes,
        "bucket_history": bucket_history,
        "rebucket_secs": rebucket_secs,
        "compact_sec": round(compact_sec, 1),
        "engine_signature": engine_sig,
        "oracle_signature": oracle_sig,
        "signature_equal": engine_sig == oracle_sig,
        "oracle_sec": round(oracle_sec, 1),
    }
    path = os.path.join(REPO, "BENCH", f"bigrun_{args.events}{evo_tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "batch_walls"}))
    if not args.keep_wal:
        shutil.rmtree(wal, ignore_errors=True)
    sys.exit(0 if out["signature_equal"] else 1)


if __name__ == "__main__":
    main()
