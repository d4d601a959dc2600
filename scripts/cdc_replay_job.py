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
    ap.add_argument("--normalize", action="store_true",
                    help="run the vectorized text-normalization UDF per batch "
                         "(the full north-star pipeline shape)")
    ap.add_argument("--mode", choices=["cow", "mor"], default="cow")
    ap.add_argument("--compact-after", action="store_true",
                    help="run (and separately time) compaction after a MOR replay")
    ap.add_argument("--warmup", action="store_true",
                    help="replay a tiny throwaway batch before timing starts "
                         "(JIT/codegen warmup — the metric is SUSTAINED "
                         "events/sec, not cold-start)")
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
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
    from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import (
        list_segments,
        run_incremental,
    )

    transform = None
    schema = TRANSCRIPT_SCHEMA
    if args.normalize:
        from pyspark.sql import types as T

        from trde703_openfoodfacts_etl_spark.functions.normalize import (
            with_normalized_text,
        )

        transform = with_normalized_text
        schema = T.StructType(
            list(TRANSCRIPT_SCHEMA.fields)
            + [T.StructField("text_norm", T.StringType(), True)]
        )

    if args.warmup:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from trde703_openfoodfacts_etl_spark.operators.merge import apply_batch

        wdir = tempfile.mkdtemp(prefix="warmup_lake_")
        wlake = LakeTable.create(spark, wdir, TRANSCRIPT_SCHEMA, num_buckets=4)
        tiny = (
            spark.range(0, 20_000)
            .select(
                F.lit("I").alias("op"),
                (F.col("id") + 1).alias("lsn"),
                F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("event_ts"),
                F.format_string("warm_%04d", F.col("id") % 500).alias("conv_id"),
                (F.col("id") % 40).cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                F.sha2(F.col("id").cast("string"), 256).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
            )
        )
        apply_batch(wlake, tiny, 0)
        shutil.rmtree(wdir, ignore_errors=True)

    n_files = len(list_segments(args.wal))
    per_batch = max(1, (n_files + args.batches - 1) // args.batches)
    lake = LakeTable.create(spark, args.lake, schema, num_buckets=args.buckets)
    t0 = time.time()
    metrics = run_incremental(
        lake, args.wal, segments_per_batch=per_batch, transform=transform,
        mode=args.mode,
    )
    wall = time.time() - t0
    events = sum(m.get("events_in", 0) for m in metrics)
    result = {
        "master": spark.sparkContext.master,
        "mode": args.mode,
        "events": events,
        "batches": len(metrics),
        "wall_sec": round(wall, 3),
        "events_per_sec": round(events / wall, 1),
        "final_rows": lake.total_rows(),
    }
    if args.mode == "mor" and args.compact_after:
        t1 = time.time()
        lake.compact()
        result["compact_sec"] = round(time.time() - t1, 3)
        result["final_rows"] = lake.total_rows()
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
