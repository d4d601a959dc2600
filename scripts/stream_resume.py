#!/usr/bin/env python
"""Large replay through the REAL Structured Streaming path with a mid-run
process kill + checkpoint restart (VERDICT r4 item 5).

The big benches drive ``run_incremental`` (library microbatch loop); this
exercises ``run_stream`` — ``readStream`` parquet file source →
``foreachBatch`` merge → Spark checkpoint — at ≥50M events, and proves the
exactly-once story end-to-end across a hard death:

1. **control**: one child process drains the WAL with run_stream
   (availableNow), prints its final 4-component state signature;
2. **interrupted**: a second child runs the same job against a fresh lake +
   checkpoint but SIGKILLs ITSELF (os.kill, no cleanup, JVM dies) right
   after the lake commit of batch K — the most adversarial point: the lake
   has committed epoch K but Spark's commit log has not, so the restart
   REDELIVERS batch K and the lake's batch-id marker must no-op it;
3. **resume**: a third child restarts run_stream with the same checkpoint
   dir and drains the rest; prints its signature.

Pass = resumed signature == control signature == DuckDB LWW oracle over the
raw WAL. Children are separate processes (own JVM) run sequentially; the
parent only generates the WAL, computes the oracle, and compares.

Run:  python scripts/stream_resume.py [--events 50000000] [--kill-after 3]
Writes BENCH/stream_resume.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIG_PREFIX = "STREAM_RESUME_SIG "


def worker(args) -> None:
    """Child: run run_stream against the WAL; optionally self-SIGKILL after
    the lake commit of the Nth applied batch."""
    from trde703_openfoodfacts_etl_spark import build_session
    from trde703_openfoodfacts_etl_spark.schema import CDC_SCHEMA, TRANSCRIPT_SCHEMA
    from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
    from trde703_openfoodfacts_etl_spark.streaming import pipeline

    spark = build_session(app_name="stream_resume_worker", cores=args.cores,
                          shuffle_partitions=2 * args.cores)
    # SIGKILLing this python process orphans the gateway JVM; record its pid
    # so the parent can reap it before the resume child starts
    try:
        os.makedirs(args.ckpt, exist_ok=True)
        with open(os.path.join(args.ckpt, "jvm.pid"), "w") as f:
            f.write(str(spark.sparkContext._gateway.proc.pid))
    except Exception:
        pass
    lake = LakeTable.create(spark, args.lake, TRANSCRIPT_SCHEMA,
                            num_buckets=max(16, args.cores))

    if args.kill_after:
        real_apply = pipeline.apply_batch
        applied = {"n": 0}

        def killing_apply(lake_, batch_df, batch_id, **kw):
            out = real_apply(lake_, batch_df, batch_id, **kw)
            if not out.get("skipped_replay"):
                applied["n"] += 1
                if applied["n"] >= args.kill_after:
                    print(f"KILLING SELF after lake commit of batch {batch_id}",
                          flush=True)
                    os.kill(os.getpid(), signal.SIGKILL)
            return out
        pipeline.apply_batch = killing_apply

    t0 = time.time()
    metrics = pipeline.run_stream(
        lake,
        args.wal,
        CDC_SCHEMA,
        checkpoint_dir=args.ckpt,
        # the Spark-generated WAL is partitioned by segment=; the dir name
        # column the file source appends is transport metadata, not payload
        transform=lambda df: df.drop("segment"),
        max_files_per_trigger=args.files_per_trigger,
    )
    wall = time.time() - t0

    from siglib import engine_signature

    print(
        SIG_PREFIX
        + json.dumps(
            {
                "signature": engine_signature(lake),
                "batches": len(metrics),
                "skipped_replays": sum(1 for m in metrics if m.get("skipped_replay")),
                "events_applied": sum(m.get("events_in", 0) for m in metrics),
                "wall_sec": round(wall, 1),
            }
        ),
        flush=True,
    )


def run_child(extra: list[str], expect_kill: bool = False) -> dict | None:
    cmd = [sys.executable, os.path.abspath(__file__), "--worker"] + extra
    p = subprocess.run(cmd, capture_output=True, text=True)
    sig = None
    for line in p.stdout.splitlines():
        if line.startswith(SIG_PREFIX):
            sig = json.loads(line[len(SIG_PREFIX):])
    if expect_kill:
        if p.returncode == -signal.SIGKILL or p.returncode == 137:
            return None
        raise RuntimeError(
            f"expected child to die by SIGKILL, got rc={p.returncode}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
        )
    if p.returncode != 0 or sig is None:
        raise RuntimeError(
            f"child failed rc={p.returncode}\n{p.stdout[-2000:]}\n{p.stderr[-3000:]}"
        )
    return sig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--events", type=int, default=50_000_000)
    ap.add_argument("--segments", type=int, default=10)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--files-per-trigger", type=int, default=4)
    ap.add_argument("--kill-after", type=int, default=0,
                    help="worker: SIGKILL self after the lake commit of the "
                         "Nth applied batch")
    ap.add_argument("--wal")
    ap.add_argument("--lake")
    ap.add_argument("--ckpt")
    args = ap.parse_args()

    if args.worker:
        worker(args)
        return

    scratch = os.path.join(REPO, "_scratch", "stream_resume")
    wal = os.path.join(scratch, f"wal_{args.events}")

    from trde703_openfoodfacts_etl_spark import build_session
    from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments_spark

    if not os.path.exists(os.path.join(wal, "_SUCCESS")):
        shutil.rmtree(wal, ignore_errors=True)
        spark = build_session(app_name="stream_resume_gen", cores=args.cores)
        t0 = time.time()
        generate_segments_spark(spark, wal, n_events=args.events,
                                n_convs=max(1000, args.events // 100),
                                n_segments=args.segments)
        print(f"WAL generated in {time.time()-t0:.0f}s", flush=True)
        spark.stop()

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from bigrun import duckdb_signature

    t0 = time.time()
    oracle_sig = duckdb_signature(wal)
    print("oracle:", oracle_sig, f"({time.time()-t0:.0f}s)", flush=True)

    common = ["--wal", wal, "--cores", str(args.cores),
              "--files-per-trigger", str(args.files_per_trigger)]

    print("== control run ==", flush=True)
    ctl_dir = os.path.join(scratch, "control")
    shutil.rmtree(ctl_dir, ignore_errors=True)
    control = run_child(common + ["--lake", os.path.join(ctl_dir, "lake"),
                                  "--ckpt", os.path.join(ctl_dir, "ckpt")])
    print("control:", control, flush=True)

    print("== interrupted run (SIGKILL after lake commit, pre stream commit) ==",
          flush=True)
    int_dir = os.path.join(scratch, "interrupted")
    shutil.rmtree(int_dir, ignore_errors=True)
    int_args = common + ["--lake", os.path.join(int_dir, "lake"),
                         "--ckpt", os.path.join(int_dir, "ckpt")]
    run_child(int_args + ["--kill-after", "3"], expect_kill=True)
    # reap the orphaned gateway JVM before the resume child starts
    pid_file = os.path.join(int_dir, "ckpt", "jvm.pid")
    try:
        with open(pid_file) as f:
            jvm_pid = int(f.read().strip())
        os.kill(jvm_pid, signal.SIGKILL)
        print(f"reaped orphaned JVM pid {jvm_pid}", flush=True)
    except (FileNotFoundError, ValueError, ProcessLookupError):
        pass
    time.sleep(3)
    print("child killed as planned; restarting from checkpoint", flush=True)
    resumed = run_child(int_args)
    print("resumed:", resumed, flush=True)

    out = {
        "events": args.events,
        "cores": args.cores,
        "files_per_trigger": args.files_per_trigger,
        "oracle_signature": oracle_sig,
        "control": control,
        "resumed": resumed,
        "resumed_equals_control": resumed["signature"] == control["signature"],
        "control_equals_oracle": control["signature"] == oracle_sig,
        "redelivery_noop_hit": resumed["skipped_replays"] > 0,
        "control_events_per_sec": round(args.events / control["wall_sec"], 0),
    }
    with open(os.path.join(REPO, "BENCH", "stream_resume.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ok = out["resumed_equals_control"] and out["control_equals_oracle"]
    shutil.rmtree(scratch, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
