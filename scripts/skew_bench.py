#!/usr/bin/env python
"""Skewed-WAL throughput bench (VERDICT r3 item 3).

The north rule claims hot conversations are handled with salting + AQE +
map-side partial LWW aggregation; tests/test_skew_and_scale.py proves
correctness under skew, this proves THROUGHPUT: replay the same event count
uniform vs with 10% of ALL events on one conversation (hot_conv_frac=0.10,
the adversarial single-hot-key preset), COW and MOR, and report events/s
plus per-phase attribution so the degradation (if any) is explainable.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/skew_bench.py
Writes BENCH/skew_bench_{sf}.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import bench_cdc_replay  # noqa: E402
from trde703_openfoodfacts_etl_spark import build_session  # noqa: E402
from trde703_openfoodfacts_etl_spark.plans import flagship  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_CDC_TRIALS", "2")))
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    flagship.sweep_stale_scratch(max_age_hours=1.0)
    spark = build_session(
        app_name="skew_bench", cores=cores, shuffle_partitions=max(2 * cores, 16)
    )

    out: dict[str, dict] = {}
    for mode in ("cow", "mor"):
        for label, skew in (("uniform", None), ("hot10pct", 0.10)):
            runs = [
                bench_cdc_replay(spark, sf_name, cores, mode=mode, skew=skew)
                for _ in range(trials)
            ]
            walls = [r["wall_sec"] for r in runs]
            med = sorted(runs, key=lambda r: r["wall_sec"])[(len(runs) - 1) // 2]
            out[f"{mode}_{label}"] = {
                "mode": mode,
                "skew": skew,
                "events": med["events"],
                "wall_all": walls,
                "wall_sec": round(statistics.median(walls), 3),
                "events_per_sec": round(med["events"] / statistics.median(walls), 1),
                "phase_sec": med["phase_sec"],
                "final_rows": med["final_rows"],
                **({"compact_sec": med.get("compact_sec")} if mode == "mor" else {}),
            }
            print(f"{mode} {label}: {out[f'{mode}_{label}']['events_per_sec']} ev/s "
                  f"(walls {walls})", flush=True)

    for mode in ("cow", "mor"):
        u, h = out[f"{mode}_uniform"], out[f"{mode}_hot10pct"]
        ratio = round(h["wall_sec"] / u["wall_sec"], 3)
        out[f"{mode}_degradation"] = ratio
        print(f"{mode}: skewed/uniform wall ratio {ratio}")

    path = os.path.join(REPO, "BENCH", f"skew_bench_{sf_name}.json")
    with open(path, "w") as f:
        json.dump({"sf": sf_name, "cores": cores, "trials": trials, **out}, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
