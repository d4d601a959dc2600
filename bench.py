#!/usr/bin/env python
"""Benchmark harness: headline queries + CDC replay throughput.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py
Prints ONE compact JSON line (the driver contract):
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: median sec, ...}, "sf": ..., "cdc": {...}}

Per-query timings are the MEDIAN of ``SPARK_GRAFT_BENCH_TRIALS`` (default 3)
runs — this shared VM varies ±35% run-to-run, and round 3's driver capture
recorded single-trial spikes (q28 12.8s vs 1.9s idle) that cost a round of
diagnosis. The full record (every trial of every query, per-batch CDC phase
breakdowns) goes to ``BENCH/bench_full_{sf}_{cores}.json``; stdout carries
only medians plus summed phase totals so the line stays small enough that a
tail-capture cannot truncate away the leading queries (round-3 lesson:
BENCH_r03.json lost q00–q19).

The CDC replay section generates a deterministic Spark-native WAL (events
scale with the sf dir), replays it through the lake engine in 4
microbatches, and reports sustained change-events/sec — the BASELINE.json
headline metric. Query timings use the noop sink (full execution, no
collect/driver materialization). Scaling-efficiency evidence (same job at
local[N] vs local[4N]) is produced by scripts/run_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from trde703_openfoodfacts_etl_spark import build_session  # noqa: E402
from trde703_openfoodfacts_etl_spark.plans import flagship  # noqa: E402
from trde703_openfoodfacts_etl_spark.plans.analytics import REGISTRY  # noqa: E402

SCRATCH = os.path.join(REPO, "_scratch", "bench")

#: events for the CDC replay bench, keyed by sf dir basename
CDC_EVENTS = {"sf0.001": 50_000, "sf0.01": 500_000, "sf0.1": 10_000_000}


def time_query(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def bench_cdc_replay(spark, sf_name: str, cores: int, mode: str = "cow",
                     skew: float | None = None) -> dict:
    from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
    from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments_spark
    from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import (
        list_segments,
        run_incremental,
    )

    n_events = CDC_EVENTS.get(sf_name, 500_000)
    n_convs = max(1000, n_events // 100)
    tag = f"{sf_name}_{n_events}" + (f"_skew{skew}" if skew else "")
    wal = os.path.join(SCRATCH, f"wal_{tag}")
    lake_dir = os.path.join(SCRATCH, f"lake_{tag}_{cores}_{mode}")
    shutil.rmtree(lake_dir, ignore_errors=True)
    if not os.path.exists(os.path.join(wal, "_SUCCESS")):
        shutil.rmtree(wal, ignore_errors=True)
        generate_segments_spark(
            spark, wal, n_events=n_events, n_convs=n_convs, n_segments=4,
            **({"hot_conv_frac": skew} if skew else {}),
        )

    lake = LakeTable.create(spark, lake_dir, TRANSCRIPT_SCHEMA, num_buckets=max(cores, 16))
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
    shutil.rmtree(lake_dir, ignore_errors=True)
    return out


def _phase_totals(runs: list[dict]) -> dict:
    """Sum each phase across batches for the median-wall run (compact
    stdout form of the full per-batch table kept in the JSON file)."""
    med = sorted(runs, key=lambda r: r["wall_sec"])[(len(runs) - 1) // 2]
    totals: dict[str, float] = {}
    for batch in med.get("phase_sec") or []:
        for k, v in (batch or {}).items():
            totals[k] = round(totals.get(k, 0.0) + v, 2)
    return totals


def _cdc_summary(runs: list[dict]) -> dict:
    walls = [r["wall_sec"] for r in runs]
    # headline wall/events_per_sec/phases all come from the SAME run (the
    # lower-median trial): statistics.median of an even trial count is an
    # interpolated wall no run actually had, and pairing it with another
    # run's phase table makes the phases not sum to the headline — the
    # exact unattributable-number confusion the phase breakdown exists to
    # prevent
    med = sorted(runs, key=lambda r: r["wall_sec"])[(len(runs) - 1) // 2]
    out = {
        "mode": med["mode"],
        "events": med["events"],
        "batches": med["batches"],
        "trials": len(runs),
        "wall_sec": med["wall_sec"],
        "wall_all": walls,
        "events_per_sec": round(med["events"] / med["wall_sec"], 1),
        "events_per_sec_best": round(med["events"] / min(walls), 1),
        "phase_sec_total": _phase_totals(runs),
        "final_rows": med["final_rows"],
    }
    if "compact_sec" in med:
        out["compact_sec"] = med["compact_sec"]
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")))
    # odd default: lower-median of 3 is a true median run; with 2 the
    # "median" degenerates to the minimum (best-of-2 posing as typical)
    cdc_trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_CDC_TRIALS", "3")))
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    # wipe PRIOR runs' temp lakes; the age floor is vs the newest mtime in
    # each tree, so a concurrently running process's in-use lakes survive
    flagship.sweep_stale_scratch(max_age_hours=1.0)
    # 2x cores shuffle partitions: bounded per-task hash state without
    # over-parallelizing; AQE coalesces at runtime (see BENCH/BASELINE.md)
    spark = build_session(app_name="bench", cores=cores, shuffle_partitions=max(2 * cores, 16))

    cdc_runs = [bench_cdc_replay(spark, sf_name, cores, "cow") for _ in range(cdc_trials)]
    mor_runs = [bench_cdc_replay(spark, sf_name, cores, "mor") for _ in range(cdc_trials)]
    cdc, cdc_mor = _cdc_summary(cdc_runs), _cdc_summary(mor_runs)

    query_trials: dict[str, list[float]] = {name: [] for name in REGISTRY}
    for _ in range(trials):
        for name, (fn, _sql) in REGISTRY.items():
            query_trials[name].append(time_query(fn(spark, sf_dir)))

    queries = {
        "q00_cdc_replay": cdc["wall_sec"],
        "q00_cdc_replay_mor": cdc_mor["wall_sec"],
    }
    queries.update(
        {name: round(statistics.median(ts), 3) for name, ts in query_trials.items()}
    )
    total = round(sum(queries.values()), 3)

    full_path = os.path.join(REPO, "BENCH", f"bench_full_{sf_name}_{cores}.json")
    os.makedirs(os.path.dirname(full_path), exist_ok=True)
    with open(full_path, "w") as f:
        json.dump(
            {
                "sf": sf_name, "cores": cores, "trials": trials,
                "cdc_trials": cdc_trials, "ts": time.time(),
                "query_trials": query_trials, "query_medians": queries,
                "cdc_runs": cdc_runs, "mor_runs": mor_runs,
            },
            f, indent=1,
        )

    # field order is load-bearing: the driver's capture has truncated the
    # HEAD of this line in past rounds (BENCH_r03/r04 "parsed": null, tail
    # starting mid-queries-map), so the headline fields and CDC summaries
    # lead and the long per-query map trails — a tail-capture keeps the
    # numbers that matter
    out = {
        "metric": "cdc_replay_plus_query_suite_wall",
        "value": total,
        "unit": "sec",
        "sf": sf_name,
        "cores": cores,
        "trials": trials,
        "cdc": cdc,
        "cdc_mor": cdc_mor,
        "full_record": os.path.relpath(full_path, REPO),
        "queries": queries,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
