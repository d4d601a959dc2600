#!/usr/bin/env python
"""Rebucket cost + post-rebucket throughput bench (VERDICT r4 item 1's
"Done" evidence at bench scale).

Replays a 10M-event WAL in 8 MOR batches; after batch 4 the table is
rebucketed 32→128 mid-stream. Reports:

- per-batch events/sec before vs after the rebucket (the claim: ingest
  rate is unchanged — apply_batch derives bucketing from the head snapshot,
  so the only cost is the rebucket itself);
- the rebucket wall (one full-table rewrite — same order as a global
  compaction);
- final 4-component signature vs an un-rebucketed control replay of the
  same WAL AND vs the DuckDB LWW oracle — exact equality required.

Run:  python scripts/rebucket_bench.py [--events 10000000]
Writes BENCH/rebucket_bench.json; exits nonzero on signature mismatch.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--rebucket-to", type=int, default=128)
    ap.add_argument("--rebucket-after-batch", type=int, default=4)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--mode", default="mor", choices=["mor", "cow"])
    args = ap.parse_args()

    from trde703_openfoodfacts_etl_spark import build_session
    from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
    from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments_spark
    from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import (
        list_segments,
        run_incremental,
    )

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from bigrun import duckdb_signature

    scratch = os.path.join(REPO, "_scratch", "rebucket_bench")
    wal = os.path.join(scratch, "wal")
    spark = build_session(app_name="rebucket_bench", cores=args.cores,
                         shuffle_partitions=2 * args.cores)
    if not os.path.exists(os.path.join(wal, "_SUCCESS")):
        shutil.rmtree(wal, ignore_errors=True)
        generate_segments_spark(spark, wal, n_events=args.events,
                                n_convs=max(1000, args.events // 100),
                                n_segments=args.segments)
    n_files = len(list_segments(wal))
    per_batch = max(1, (n_files + args.segments - 1) // args.segments)
    batch_events = args.events / args.segments

    from siglib import engine_signature as signature

    def drain(lake, walls):
        while True:
            t0 = time.time()
            m = run_incremental(lake, wal, segments_per_batch=per_batch,
                                max_batches=1, mode=args.mode,
                                auto_compact_after=6 if args.mode == "mor" else None)
            if not m:
                return
            walls.append(time.time() - t0)

    # -- rebucketed run ------------------------------------------------------
    lake_dir = os.path.join(scratch, "lake_rb")
    shutil.rmtree(lake_dir, ignore_errors=True)
    lake = LakeTable.create(spark, lake_dir, TRANSCRIPT_SCHEMA, num_buckets=args.buckets)
    pre_walls: list[float] = []
    for _ in range(args.rebucket_after_batch):
        t0 = time.time()
        if not run_incremental(lake, wal, segments_per_batch=per_batch,
                               max_batches=1, mode=args.mode,
                               auto_compact_after=6 if args.mode == "mor" else None):
            break
        pre_walls.append(time.time() - t0)
    t0 = time.time()
    lake.rebucket(args.rebucket_to)
    rebucket_sec = time.time() - t0
    post_walls: list[float] = []
    drain(lake, post_walls)
    lake.compact()
    rb_sig = signature(lake)
    shutil.rmtree(lake_dir, ignore_errors=True)

    # -- control run (no rebucket) ------------------------------------------
    ctl_dir = os.path.join(scratch, "lake_ctl")
    shutil.rmtree(ctl_dir, ignore_errors=True)
    ctl = LakeTable.create(spark, ctl_dir, TRANSCRIPT_SCHEMA, num_buckets=args.buckets)
    ctl_walls: list[float] = []
    drain(ctl, ctl_walls)
    ctl.compact()
    ctl_sig = signature(ctl)
    shutil.rmtree(ctl_dir, ignore_errors=True)

    oracle_sig = duckdb_signature(wal)

    pre_med = statistics.median(pre_walls)
    post_med = statistics.median(post_walls)
    out = {
        "events": args.events,
        "mode": args.mode,
        "buckets_before": args.buckets,
        "buckets_after": args.rebucket_to,
        "rebucket_after_batch": args.rebucket_after_batch,
        "rebucket_sec": round(rebucket_sec, 1),
        "pre_rebucket_batch_walls": [round(w, 1) for w in pre_walls],
        "post_rebucket_batch_walls": [round(w, 1) for w in post_walls],
        "pre_rebucket_events_per_sec": round(batch_events / pre_med, 0),
        "post_rebucket_events_per_sec": round(batch_events / post_med, 0),
        "post_over_pre_wall_ratio": round(post_med / pre_med, 3),
        "control_batch_walls": [round(w, 1) for w in ctl_walls],
        "rebucketed_signature": rb_sig,
        "control_signature": ctl_sig,
        "oracle_signature": oracle_sig,
        "signature_equal": rb_sig == ctl_sig == oracle_sig,
    }
    with open(os.path.join(REPO, "BENCH", "rebucket_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(scratch, ignore_errors=True)
    sys.exit(0 if out["signature_equal"] else 1)


if __name__ == "__main__":
    main()
