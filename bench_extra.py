#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual registry queries
with the noop sink, optionally capturing .explain("formatted") to
plans/<tag>/<query>_<suffix>.txt. Does NOT replace bench.py (frozen driver
contract) — this is the optimization-round measurement tool.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [--queries q39_interval_join,q21_ngram_jaccard] [--trials 3] \
      [--explain plans/r06 --suffix before] [--out /tmp/bx.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from trde703_openfoodfacts_etl_spark import build_session  # noqa: E402
from trde703_openfoodfacts_etl_spark.plans.analytics import REGISTRY  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="", help="comma-separated; default all")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--explain", default="", help="dir to write explain files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    spark = build_session(
        app_name="bench_extra", cores=cores, shuffle_partitions=max(2 * cores, 16)
    )

    names = [q.strip() for q in args.queries.split(",") if q.strip()] or list(REGISTRY)
    results: dict[str, dict] = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"{name} [{sf_name}]")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        walls = []
        for _ in range(args.trials):
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(walls) if walls else None
        results[name] = {"median": med, "all": walls}
        print(f"{name}: median {med}s  {walls}", file=sys.stderr)

    out = {"sf": sf_name, "cores": cores, "trials": args.trials, "queries": results}
    line = json.dumps(out, separators=(",", ":"))
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
