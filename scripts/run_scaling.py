#!/usr/bin/env python
"""Scaling-efficiency evidence: same CDC replay job, same input, two
parallelism levels (local[N] vs local[4N]) via spark-submit --py-files.

Writes BENCH/BASELINE.md with throughput at both levels + efficiency
= (T_4N / T_N) / 4 (BASELINE.json criterion, sandbox form — no real
cluster available, per the driver's north-rule note).

Run: python scripts/run_scaling.py [--events 5000000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, "_scratch", "scaling")


def build_zip() -> str:
    """Package the engine for --py-files (exercises cluster-style deploy)."""
    zpath = os.path.join(SCRATCH, "engine.zip")
    os.makedirs(SCRATCH, exist_ok=True)
    pkg = os.path.join(REPO, "trde703_openfoodfacts_etl_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def gen_input(events: int) -> str:
    wal = os.path.join(SCRATCH, f"wal_{events}")
    if os.path.exists(os.path.join(wal, "_SUCCESS")):
        return wal
    shutil.rmtree(wal, ignore_errors=True)
    sys.path.insert(0, REPO)
    from trde703_openfoodfacts_etl_spark import build_session
    from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments_spark

    spark = build_session(app_name="scaling-gen", cores=32)
    generate_segments_spark(spark, wal, n_events=events, n_convs=max(1000, events // 100),
                            n_segments=4)
    spark.stop()
    return wal


def submit(cores: int, wal: str, zpath: str, tag: str) -> dict:
    lake = os.path.join(SCRATCH, f"lake_{tag}")
    shutil.rmtree(lake, ignore_errors=True)
    out = os.path.join(SCRATCH, f"result_{tag}.json")
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "24g",
        "--py-files", zpath,
        os.path.join(REPO, "scripts", "cdc_replay_job.py"),
        "--wal", wal, "--lake", lake, "--buckets", "32",
        "--batches", "2", "--shuffle-partitions", str(max(cores, 8)),
        "--out", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--n", type=int, default=8, help="N; runs local[N] and local[4N]")
    args = ap.parse_args()

    zpath = build_zip()
    wal = gen_input(args.events)
    lo = submit(args.n, wal, zpath, f"n{args.n}")
    hi = submit(args.n * 4, wal, zpath, f"n{args.n * 4}")
    assert lo["final_rows"] == hi["final_rows"], "state mismatch across parallelism"

    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — CDC replay throughput & scaling efficiency

Same job (`scripts/cdc_replay_job.py` via `spark-submit --py-files engine.zip`),
same pre-generated input ({args.events:,} change events, 4 microbatches,
32 buckets), two parallelism levels. No real cluster in this sandbox, so the
north rule's N→4N executor criterion is evidenced at `local[{args.n}]` vs
`local[{args.n * 4}]` (driver instruction / BASELINE.md note).

| master | events | wall (s) | sustained events/sec | final rows |
|---|---|---|---|---|
| local[{args.n}] | {lo['events']:,} | {lo['wall_sec']} | {lo['events_per_sec']:,} | {lo['final_rows']:,} |
| local[{args.n * 4}] | {hi['events']:,} | {hi['wall_sec']} | {hi['events_per_sec']:,} | {hi['final_rows']:,} |

**Scaling efficiency (T_4N / T_N) / 4 = {eff:.3f}** (target ≥ 0.8)

Final table state identical at both levels ({lo['final_rows']:,} rows) —
parallelism does not affect correctness (LWW is order- and
partitioning-independent).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"lo": lo, "hi": hi, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
