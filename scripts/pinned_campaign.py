#!/usr/bin/env python
"""Pinned-local 2->8 scaling trials with paired ceiling controls — the
round-4 refresh of the round-2/3 headline campaign, same method: each trial
is ceiling@2 -> ceiling@8 -> pinned local[2] -> pinned local[8], MOR, 12M
events, 4 batches. Writes BENCH/pinned_campaign.json."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_scaling import build_zip, gen_input, submit  # noqa: E402
from standalone_campaign import ceiling  # noqa: E402


def main() -> None:
    trials_n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    events = 12_000_000
    zpath = build_zip()
    wal = gen_input(events)
    trials = []
    for t in range(trials_n):
        c_lo, c_hi = ceiling(2), ceiling(8)
        ceil_eff = (c_lo / c_hi) / 4.0
        lo = submit(2, wal, zpath, f"pc_t{t}_lo", normalize=False,
                    pin_cpus=True, mode="mor", batches=4)
        hi = submit(8, wal, zpath, f"pc_t{t}_hi", normalize=False,
                    pin_cpus=True, mode="mor", batches=4)
        assert lo["final_rows"] == hi["final_rows"]
        eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4.0
        row = {"trial": t + 1, "lo_ev_s": lo["events_per_sec"],
               "hi_ev_s": hi["events_per_sec"], "eff": round(eff, 3),
               "ceiling_lo_s": c_lo, "ceiling_hi_s": c_hi,
               "ceiling_eff": round(ceil_eff, 3),
               "engine_over_ceiling": round(eff / ceil_eff, 2),
               "final_rows": lo["final_rows"]}
        trials.append(row)
        print(json.dumps(row), flush=True)
    med = sorted(x["eff"] for x in trials)[(len(trials) - 1) // 2]
    med_n = sorted(x["engine_over_ceiling"] for x in trials)[(len(trials) - 1) // 2]
    out = {"form": "pinned_paired_ceiling", "events": events, "trials": trials,
           "median_eff": med, "median_engine_over_ceiling": med_n}
    with open(os.path.join(REPO, "BENCH", "pinned_campaign.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"median_eff": med, "median_engine_over_ceiling": med_n}))


if __name__ == "__main__":
    main()
