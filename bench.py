#!/usr/bin/env python
"""Benchmark harness: headline queries + CDC replay throughput.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py
Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "cdc": {...}}

The CDC replay section generates a deterministic Spark-native WAL
(events scale with the sf dir), replays it through the lake engine in 4
microbatches, and reports sustained change-events/sec — the BASELINE.json
headline metric. Query timings use the noop sink (full execution, no
collect/driver materialization). Scaling-efficiency evidence (same job at
local[N] vs local[4N]) is produced by scripts/run_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trde703_openfoodfacts_etl_spark import build_session  # noqa: E402
from trde703_openfoodfacts_etl_spark.plans import flagship  # noqa: E402
from trde703_openfoodfacts_etl_spark.plans.analytics import REGISTRY  # noqa: E402

SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_scratch", "bench")

#: events for the CDC replay bench, keyed by sf dir basename
CDC_EVENTS = {"sf0.001": 50_000, "sf0.01": 500_000, "sf0.1": 10_000_000}


def time_query(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def bench_cdc_replay(spark, sf_name: str, cores: int, mode: str = "cow") -> dict:
    from trde703_openfoodfacts_etl_spark.operators.merge import apply_batch
    from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
    from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments_spark
    from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import run_incremental

    n_events = CDC_EVENTS.get(sf_name, 500_000)
    n_convs = max(1000, n_events // 100)
    wal = os.path.join(SCRATCH, f"wal_{sf_name}_{n_events}")
    lake_dir = os.path.join(SCRATCH, f"lake_{sf_name}_{cores}_{mode}")
    shutil.rmtree(lake_dir, ignore_errors=True)
    if not os.path.exists(os.path.join(wal, "_SUCCESS")):
        shutil.rmtree(wal, ignore_errors=True)
        generate_segments_spark(spark, wal, n_events=n_events, n_convs=n_convs, n_segments=4)

    lake = LakeTable.create(spark, lake_dir, TRANSCRIPT_SCHEMA, num_buckets=max(cores, 16))
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import list_segments

    n_files = len(list_segments(wal))
    per_batch = max(1, (n_files + 3) // 4)  # 4 microbatches
    t0 = time.time()
    metrics = run_incremental(lake, wal, segments_per_batch=per_batch, mode=mode)
    wall = time.time() - t0
    out = {
        "mode": mode,
        "events": n_events,
        "batches": len(metrics),
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        # per-batch phase breakdown (apply_batch phase_sec): separates plan /
        # touched-scan / skinny-change-detect / payload-write / commit so a
        # regressed wall number is attributable (VERDICT r2 item 1)
        "phase_sec": [m.get("phase_sec") for m in metrics],
    }
    if mode == "mor":
        t1 = time.time()
        lake.compact()
        out["compact_sec"] = round(time.time() - t1, 3)
    out["final_rows"] = lake.total_rows()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    # wipe PRIOR runs' temp lakes; the 1h age floor protects a concurrently
    # running process's in-use lakes (invisible to this process's live set)
    flagship.sweep_stale_scratch(max_age_hours=1.0)
    # 2x cores shuffle partitions: bounded per-task hash state without
    # over-parallelizing; AQE coalesces at runtime (see BENCH/BASELINE.md)
    spark = build_session(app_name="bench", cores=cores, shuffle_partitions=max(2 * cores, 16))

    queries: dict[str, float] = {}
    total = 0.0

    cdc = bench_cdc_replay(spark, sf_name, cores, mode="cow")
    queries["q00_cdc_replay"] = cdc["wall_sec"]
    total += cdc["wall_sec"]
    cdc_mor = bench_cdc_replay(spark, sf_name, cores, mode="mor")
    queries["q00_cdc_replay_mor"] = cdc_mor["wall_sec"]
    total += cdc_mor["wall_sec"]

    for name, (fn, _sql) in REGISTRY.items():
        df = fn(spark, sf_dir)
        sec = time_query(df)
        queries[name] = sec
        total += sec

    out = {
        "metric": "cdc_replay_plus_query_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_name,
        "cores": cores,
        "cdc": cdc,
        "cdc_mor": cdc_mor,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
