"""SCD2 key history / as-of reads, watermark-driven tombstone GC, snapshot
CAS multi-writer safety, and configurable quality gates (VERDICT r1 #6-#10).
"""

from __future__ import annotations

import json

import pytest

from trde703_openfoodfacts_etl_spark.operators.merge import apply_batch
from trde703_openfoodfacts_etl_spark.quality import QualityThresholds, table_quality_report
from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable, SnapshotConflict

from helpers import make_events


def test_key_history_versions_and_asof(spark, tmp_path):
    """I → U → U(no-op) → D replay yields exactly 3 versions (the no-op
    update creates no new version) with contiguous validity intervals."""
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    apply_batch(lake, make_events(spark, [("I", 1, "c1", 0, "user", "v1", None, 100)]), 0)
    apply_batch(lake, make_events(spark, [("U", 2, "c1", 0, "user", "v2", None, 200)]), 1)
    # unrelated key changes — must not create versions for (c1, 0)
    apply_batch(lake, make_events(spark, [("I", 3, "zz", 5, "user", "x", None, 250)]), 2)
    apply_batch(lake, make_events(spark, [("D", 4, "c1", 0, None, None, None, 300)]), 3)

    hist = lake.key_history("c1", 0).orderBy("valid_from_snapshot").collect()
    assert [r["text"] for r in hist] == ["v1", "v2", None]
    assert [bool(r["_deleted"]) for r in hist] == [False, False, True]
    # intervals chain: each version's valid_to == next version's valid_from
    for prev, nxt in zip(hist, hist[1:]):
        assert prev["valid_to_snapshot"] == nxt["valid_from_snapshot"]
    assert hist[-1]["valid_to_snapshot"] is None and hist[-1]["is_current"]
    assert not hist[0]["is_current"]

    # as-of read: state at the v1 commit time
    v1_time = hist[0]["valid_from_unix"]
    asof = lake.read_asof(v1_time).filter("conv_id = 'c1'").collect()
    assert [r["text"] for r in asof] == ["v1"]


def test_key_history_prunes_unchanged_snapshots(spark, tmp_path):
    """Snapshots that didn't touch the key's bucket contribute no reads."""
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    apply_batch(lake, make_events(spark, [("I", 1, "c1", 0, "user", "v1", None, 100)]), 0)
    for i in range(3):  # churn other keys/buckets
        apply_batch(
            lake, make_events(spark, [("I", 10 + i, f"other{i}", 0, "user", "y", None, 150 + i)]),
            1 + i,
        )
    hist = lake.key_history("c1", 0).collect()
    assert len(hist) == 1 and hist[0]["is_current"]


def test_gc_tombstones_watermark_policy(spark, tmp_path):
    """Tombstones older than watermark - lateness are collected; younger
    ones survive; a zombie (late event older than a surviving tombstone)
    still cannot resurrect its key."""
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    apply_batch(lake, make_events(spark, [
        ("I", 1, "c1", 0, "user", "a", None, 100),
        ("I", 2, "c2", 0, "user", "b", None, 110),
    ]), 0)
    apply_batch(lake, make_events(spark, [("D", 3, "c1", 0, None, None, None, 200)]), 1)
    apply_batch(lake, make_events(spark, [("D", 4, "c2", 0, None, None, None, 5000)]), 2)
    # advance the watermark far past the first delete only
    apply_batch(lake, make_events(spark, [("I", 5, "c3", 0, "user", "c", None, 6000)]), 3)

    dead = lake.read(include_deleted=True, with_meta=True).filter("_deleted").count()
    assert dead == 2
    # lateness 2000s: horizon = 6000 - 2000 = 4000 → c1's tombstone (ts=200)
    # goes, c2's (ts=5000) stays
    new = lake.gc_tombstones(allowed_lateness_sec=2000)
    assert new is not None
    remaining = lake.read(include_deleted=True, with_meta=True).filter("_deleted").collect()
    assert [r["conv_id"] for r in remaining] == ["c2"]
    # manifest tombstone accounting matches
    snap = lake.snapshot()
    assert sum(b.get("tombstones") or 0 for b in snap["buckets"].values()) == 1

    # zombie guard: a late event for c2 (ts=4500 < tombstone ts=5000) loses
    apply_batch(lake, make_events(spark, [("U", 6, "c2", 0, "user", "zombie", None, 4500)]), 4)
    assert lake.read().filter("conv_id = 'c2'").count() == 0


def test_snapshot_cas_conflict_and_retry(spark, tmp_path):
    """Two writers racing to the same child snapshot id: the CAS rejects the
    loser; apply_batch retries against the new head and both batches land."""
    root = str(tmp_path / "lake")
    a = LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, num_buckets=4)
    b = LakeTable(spark, root)

    # direct CAS check
    snap = a.snapshot()
    s1 = dict(snap, snapshot_id=snap["snapshot_id"] + 1, parent=snap["snapshot_id"])
    a._write_snapshot(s1)
    with pytest.raises(SnapshotConflict):
        b._write_snapshot(dict(s1))

    # retry path: simulate writer B computing against a stale head by
    # interleaving commits — apply_batch re-reads the snapshot per attempt,
    # so both writers' batches land even when their target ids collide
    apply_batch(a, make_events(spark, [("I", 10, "w1", 0, "user", "from-a", None, 100)]), 0,
                stream_id="wa")
    apply_batch(b, make_events(spark, [("I", 11, "w2", 0, "user", "from-b", None, 101)]), 0,
                stream_id="wb")
    texts = {r["conv_id"]: r["text"] for r in a.read().collect()}
    assert texts["w1"] == "from-a" and texts["w2"] == "from-b"


def test_quality_thresholds_and_alert_levels(spark):
    good = spark.createDataFrame(
        [("c1", 0, "user", "hello world", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rpt = table_quality_report(good)
    assert rpt["passed"] and rpt["alert_level"] == "ok"
    assert {g["gate"] for g in rpt["gates"]} == {
        "completeness", "uniqueness", "invalid_role_rate", "blank_text_rate"}

    # failing fixture: blank text + invalid role trips configurable bounds
    bad = spark.createDataFrame(
        [
            ("c1", 0, "user", "", None, None),
            ("c1", 1, "alien", "x", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    strict = QualityThresholds(max_blank_text_rate=0.1, max_invalid_role_rate=0.1)
    rpt2 = table_quality_report(bad, thresholds=strict)
    assert not rpt2["passed"] and rpt2["alert_level"] == "fail"
    failing = {g["gate"] for g in rpt2["gates"] if g["level"] == "fail"}
    assert "blank_text_rate" in failing and "invalid_role_rate" in failing
    # the same data passes under lenient bounds
    lenient = QualityThresholds(max_blank_text_rate=0.9, max_invalid_role_rate=0.9,
                                min_completeness=0.1)
    assert table_quality_report(bad, thresholds=lenient)["passed"]
    # report is JSON-serializable (sink contract)
    json.dumps(rpt2)


def test_concurrent_writers_thread_race(spark, tmp_path):
    """TRUE concurrency: two threads committing batches to the same table
    simultaneously. The manifest CAS serializes them; apply_batch's retry
    re-reads the head per attempt, so every batch lands exactly once and
    the snapshot lineage stays a single parent chain."""
    import threading

    root = str(tmp_path / "lake_race")
    lake_a = LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, num_buckets=4)
    lake_b = LakeTable(spark, root)
    errs = []

    def writer(lake, sid, prefix, n):
        try:
            for i in range(n):
                ev = make_events(
                    spark,
                    [("I", i, f"{prefix}{i}", 0, "user", f"txt-{prefix}{i}", None, 10 + i)],
                )
                apply_batch(lake, ev, i, stream_id=sid, max_commit_retries=10)
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(lake_a, "sa", "a", 3))
    t2 = threading.Thread(target=writer, args=(lake_b, "sb", "b", 3))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    state = {r["conv_id"]: r["text"] for r in lake_a.read().collect()}
    assert state == {f"{p}{i}": f"txt-{p}{i}" for p in ("a", "b") for i in range(3)}

    # lineage is one unbroken parent chain covering all six commits
    head = lake_a.snapshot()
    chain = [head["snapshot_id"]]
    while head["parent"] is not None:
        head = lake_a.snapshot(head["parent"])
        chain.append(head["snapshot_id"])
    assert chain == sorted(chain, reverse=True) and len(chain) == 7  # init + 6


def test_key_history_long_chain_guard(spark, tmp_path):
    """A key updated in many snapshots: history works up to max_versions and
    raises (instead of ballooning the driver with unions/collects) beyond it."""
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=2)
    n = 25
    for i in range(n):
        apply_batch(
            lake, make_events(spark, [("U", i + 1, "hot", 0, "user", f"v{i}", None, 100 + i)]), i
        )
    hist = lake.key_history("hot", 0).orderBy("valid_from_snapshot").collect()
    assert [r["text"] for r in hist] == [f"v{i}" for i in range(n)]
    assert hist[-1]["is_current"]
    with pytest.raises(ValueError, match="max_versions"):
        lake.key_history("hot", 0, max_versions=10)


def test_auto_vacuum_bounds_files_keeps_travel_window(spark, tmp_path):
    """run_incremental(auto_vacuum_every=...) keeps manifest + data file
    counts bounded during long ingest, final state stays oracle-equal, and
    time travel still works inside the keep window."""
    import glob
    import os

    from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import run_incremental
    from helpers import assert_states_equal, duckdb_replay_oracle, lake_state_pdf

    wal = str(tmp_path / "wal")
    generate_segments(wal, n_convs=80, n_events=6_000, n_segments=8, seed=3)
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    run_incremental(lake, wal, segments_per_batch=1,
                    auto_vacuum_every=2, vacuum_keep_snapshots=3)

    manifests = glob.glob(os.path.join(str(tmp_path / "lake"), "manifests", "snapshot-*.json"))
    assert 1 <= len(manifests) <= 4  # keep window (+ at most one post-vacuum commit)
    # every remaining data file is referenced by a kept snapshot (no orphans)
    data_files = glob.glob(os.path.join(str(tmp_path / "lake"), "data", "**", "*.parquet"),
                           recursive=True)
    live = set()
    n_buckets = 0
    for m in manifests:
        s = json.load(open(m))
        n_buckets = len(s["buckets"])
        for b in s["buckets"].values():
            live.update(fe["path"] for fe in b["files"])
    assert len(data_files) <= len(live) + n_buckets
    # state equals the oracle after vacuuming mid-ingest
    assert_states_equal(lake_state_pdf(lake), duckdb_replay_oracle(f"{wal}/*.parquet"))
    # time travel within the keep window still resolves
    lineage = lake.snapshot_lineage()
    assert 1 <= len(lineage) <= 4
    past = lake.read(snapshot_id=lineage[0]["snapshot_id"])
    assert past.count() > 0


def test_changes_and_time_travel_past_vacuum_fail_loudly(spark, tmp_path):
    """changes(from)/read(snapshot_id=) where the manifest was vacuumed must
    raise SnapshotNotFound with a vacuum-pointing message — never silently
    diff/read against the oldest surviving snapshot (VERDICT r4 item 7)."""
    from trde703_openfoodfacts_etl_spark.sources.lake import SnapshotNotFound

    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    for i in range(4):
        apply_batch(lake, make_events(spark, [("U", 10 + i, "c1", 0, "user", f"v{i}", None, i)]), i)
    lake.vacuum(keep_snapshots=2)
    with pytest.raises(SnapshotNotFound, match="vacuum"):
        lake.changes(from_snapshot=1)
    with pytest.raises(SnapshotNotFound, match="vacuum"):
        lake.read(snapshot_id=1)
    # inside the keep window still works
    assert lake.changes(from_snapshot=lake.latest_id() - 1).count() >= 0


_CHILD_WRITER_SRC = """
import sys
from pyspark.sql import SparkSession, functions as F
from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments
from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
from trde703_openfoodfacts_etl_spark.streaming.pipeline import run_incremental

root, wal, sid, prefix, seed = sys.argv[1:6]
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
generate_segments(wal, n_convs=60, n_events=4000, n_segments=3, seed=int(seed))
lake = LakeTable(spark, root)
out = run_incremental(
    lake, wal, stream_id=sid, segments_per_batch=1,
    transform=lambda df: df.withColumn(
        "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))),
)
assert len(out) == 3, out
"""


def test_concurrent_writers_process_race(spark, tmp_path):
    """Cross-PROCESS concurrency: two independent driver JVMs (own
    SparkSessions) each run a 3-batch incremental ingest of their own
    stream into the SAME lake directory at the same time. The manifest CAS
    (temp + fsync + os.link — atomic across processes on one filesystem)
    serializes the commits; apply_batch's conflict retry re-reads the head,
    so both streams land exactly once, the final state equals the combined
    per-stream oracles, and the lineage is one unbroken parent chain."""
    import os
    import subprocess
    import sys

    import pandas as pd

    from helpers import assert_states_equal, duckdb_replay_oracle, lake_state_pdf

    root = str(tmp_path / "lake_xproc")
    LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, num_buckets=4)
    env = {**os.environ, "PYTHONPATH": os.getcwd()}
    procs, wals = [], {}
    for sid, prefix, seed in (("sa", "a-", 7), ("sb", "b-", 8)):
        wals[prefix] = str(tmp_path / f"wal_{sid}")
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD_WRITER_SRC,
                 root, wals[prefix], sid, prefix, str(seed)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    for p in procs:
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, out.decode(errors="replace")[-3000:]

    oracle = pd.concat(
        [
            duckdb_replay_oracle(f"{wals[pfx]}/*.parquet").assign(
                conv_id=lambda d, pfx=pfx: pfx + d["conv_id"]
            )
            for pfx in ("a-", "b-")
        ]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    lake = LakeTable(spark, root)
    assert_states_equal(lake_state_pdf(lake), oracle)

    # lineage: init + 6 commits in one parent chain; both streams' batch
    # markers and segment watermarks survived the interleaving
    head = lake.snapshot()
    chain = [head["snapshot_id"]]
    while head["parent"] is not None:
        head = lake.snapshot(head["parent"])
        chain.append(head["snapshot_id"])
    assert len(chain) == 7
    assert lake.last_batch_id("sa") == 2 and lake.last_batch_id("sb") == 2
