#!/usr/bin/env python
"""Standalone-cluster scaling trials WITH paired machine-ceiling controls
(VERDICT r3 item 8).

The pinned 2->8 campaign already pairs each trial with a same-window
pure-compute ceiling run so VM-tenancy noise can be normalized out; the
standalone form (REAL executor JVMs — strongest evidence) lacked that
control. Each trial here is: ceiling@2 cores -> ceiling@8 cores ->
standalone 2-executor run -> standalone 8-executor run, back to back, so
engine efficiency can be divided by the ceiling efficiency measured in the
SAME window.

Run:  python scripts/standalone_campaign.py [--trials 3] [--events 12000000]
Writes BENCH/standalone_campaign.json and prints the table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def ceiling(cores: int) -> float:
    """Pure-compute control on `cores` pinned CPUs; returns seconds."""
    res = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable,
         os.path.join(REPO, "scripts", "cpu_ceiling_test.py"), str(cores)],
        capture_output=True, text=True, check=True,
    )
    m = re.search(r"cores:\s*([0-9.]+)\s*s", res.stdout)
    return float(m.group(1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--events", type=int, default=12_000_000)
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    from run_scaling import build_zip, gen_input, submit
    from standalone_cluster import StandaloneCluster

    zpath = build_zip()
    wal = gen_input(args.events)

    trials = []
    for t in range(args.trials):
        c_lo = ceiling(args.n)
        c_hi = ceiling(args.n * 4)
        ceil_speedup = c_lo / c_hi
        ceil_eff = ceil_speedup / 4.0

        legs = {}
        for cores, tag in ((args.n, "lo"), (args.n * 4, "hi")):
            with StandaloneCluster(cores) as cluster:
                legs[tag] = submit(
                    cores, wal, zpath, f"sc_t{t}_{tag}",
                    normalize=False, master=cluster.master_url,
                    mode="mor", batches=4,
                )
        assert legs["lo"]["final_rows"] == legs["hi"]["final_rows"]
        eff = (legs["hi"]["events_per_sec"] / legs["lo"]["events_per_sec"]) / 4.0
        row = {
            "trial": t + 1,
            "lo_ev_s": legs["lo"]["events_per_sec"],
            "hi_ev_s": legs["hi"]["events_per_sec"],
            "eff": round(eff, 3),
            "ceiling_lo_s": c_lo,
            "ceiling_hi_s": c_hi,
            "ceiling_speedup": round(ceil_speedup, 2),
            "ceiling_eff": round(ceil_eff, 3),
            "engine_over_ceiling": round(eff / ceil_eff, 2),
            "final_rows": legs["lo"]["final_rows"],
        }
        trials.append(row)
        print(json.dumps(row), flush=True)

    med = sorted(t["eff"] for t in trials)[(len(trials) - 1) // 2]
    med_norm = sorted(t["engine_over_ceiling"] for t in trials)[(len(trials) - 1) // 2]
    out = {
        "form": "standalone_paired_ceiling",
        "events": args.events,
        "n": args.n,
        "trials": trials,
        "median_eff": med,
        "median_engine_over_ceiling": med_norm,
    }
    path = os.path.join(REPO, "BENCH", "standalone_campaign.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"median_eff": med, "median_engine_over_ceiling": med_norm}))


if __name__ == "__main__":
    main()
