#!/usr/bin/env python
"""Standalone CDC replay job for spark-submit (scaling-efficiency evidence).

Submitted as:
  spark-submit --master local[N] --py-files engine.zip scripts/cdc_replay_job.py \
      --wal <dir> --lake <dir> --buckets 32 --batches 4 --out <json>

Replays a pre-generated WAL into a fresh lake and writes a JSON result with
wall time + sustained events/sec. The input is identical across parallelism
levels; only --master changes — the north rule's two-cluster-size criterion
evidenced at local[N] vs local[4N] (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wal", required=True)
    ap.add_argument("--lake", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("cdc-replay-scaling")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
    from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import (
        list_segments,
        run_incremental,
    )

    n_files = len(list_segments(args.wal))
    per_batch = max(1, (n_files + args.batches - 1) // args.batches)
    lake = LakeTable.create(spark, args.lake, TRANSCRIPT_SCHEMA, num_buckets=args.buckets)
    t0 = time.time()
    metrics = run_incremental(lake, args.wal, segments_per_batch=per_batch)
    wall = time.time() - t0
    events = sum(m.get("events_in", 0) for m in metrics)
    result = {
        "master": spark.sparkContext.master,
        "events": events,
        "batches": len(metrics),
        "wall_sec": round(wall, 3),
        "events_per_sec": round(events / wall, 1),
        "final_rows": lake.total_rows(),
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
