"""Exactly-once + resume semantics (SURVEY.md §2.9, §5): replayed batch is a
no-op; crash between data write and manifest commit converges on restart."""

from __future__ import annotations

import os

from trde703_openfoodfacts_etl_spark.operators.merge import apply_batch
from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments
from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
from trde703_openfoodfacts_etl_spark.streaming.pipeline import run_incremental

from helpers import assert_states_equal, duckdb_replay_oracle, lake_state_pdf, make_events


def test_replayed_batch_id_is_noop(spark, tmp_path):
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    ev = make_events(spark, [("I", 1, "c1", 0, "user", "a", None, 100)])
    m1 = apply_batch(lake, ev, 0)
    sid = m1["snapshot_id"]
    # redelivered foreachBatch epoch: same batch_id, even different content
    ev2 = make_events(spark, [("U", 9, "c1", 0, "user", "should-not-apply", None, 900)])
    m2 = apply_batch(lake, ev2, 0)
    assert m2["skipped_replay"] and m2["snapshot_id"] == sid
    assert lake_state_pdf(lake)["text"].tolist() == ["a"]


def test_crash_before_manifest_commit_converges(spark, tmp_path):
    """Simulate: batch applied (data files written) but the snapshot rename
    never happened → manifest still at the parent. Restarting the stream
    re-applies the batch; orphan data files are never referenced."""
    wal = str(tmp_path / "wal")
    generate_segments(wal, n_convs=50, n_events=3_000, n_segments=3, seed=11)
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    run_incremental(lake, wal, segments_per_batch=1, max_batches=2)

    # crash: destroy the last commit (manifest only — data files remain)
    last = lake.latest_id()
    os.remove(lake._snap_path(last))
    assert lake.latest_id() == last - 1

    # restart: resumes from the manifest's high-watermark batch, re-applies
    run_incremental(lake, wal, segments_per_batch=1)
    oracle = duckdb_replay_oracle(f"{wal}/*.parquet")
    assert_states_equal(lake_state_pdf(lake), oracle)


def test_resume_mid_stream_equals_uninterrupted(spark, tmp_path):
    wal = str(tmp_path / "wal")
    generate_segments(wal, n_convs=50, n_events=3_000, n_segments=3, seed=13)

    a = LakeTable.create(spark, str(tmp_path / "a"), TRANSCRIPT_SCHEMA, num_buckets=4)
    run_incremental(a, wal, segments_per_batch=1, max_batches=1)  # stop after 1
    run_incremental(a, wal, segments_per_batch=1)  # resume

    b = LakeTable.create(spark, str(tmp_path / "b"), TRANSCRIPT_SCHEMA, num_buckets=4)
    run_incremental(b, wal, segments_per_batch=1)  # uninterrupted

    assert_states_equal(lake_state_pdf(a), lake_state_pdf(b))


def test_manifest_lineage_and_hwm(spark, tmp_path):
    wal = str(tmp_path / "wal")
    generate_segments(wal, n_convs=50, n_events=3_000, n_segments=3, seed=17)
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    metrics = run_incremental(lake, wal, segments_per_batch=1)
    snap = lake.snapshot()
    # per-partition high-watermark LSN is monotone and covers the feed
    hwms = [b["hwm_lsn"] for b in snap["buckets"].values()]
    assert max(hwms) == 3000  # last lsn of the feed
    assert snap["streams"]["default"] == 2
    assert all(m["events_in"] > 0 for m in metrics)
    # manifest row counts equal actual live rows
    assert lake.total_rows() == lake.read().count()


def test_time_travel_and_vacuum(spark, tmp_path):
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    apply_batch(lake, make_events(spark, [("I", 1, "c1", 0, "user", "v1", None, 100)]), 0)
    sid1 = lake.latest_id()
    apply_batch(lake, make_events(spark, [("U", 2, "c1", 0, "user", "v2", None, 200)]), 1)
    assert lake.read(snapshot_id=sid1).select("text").first()[0] == "v1"  # time travel
    assert lake.read().select("text").first()[0] == "v2"
    removed = lake.vacuum(keep_snapshots=1)
    assert removed  # old epoch files gone
    assert lake.read().select("text").first()[0] == "v2"  # latest intact


def test_resume_with_grown_wal_multi_segment_batches(spark, tmp_path):
    """Regression (ADVICE r1, high): with segments_per_batch > 1, a resumed
    run must not re-slice the grown segment listing positionally — segments
    that fall into an already-committed batch id would be silently lost.
    Resume is watermark-based: exactly the unapplied segments are batched."""
    import shutil

    src = str(tmp_path / "all")
    paths = generate_segments(src, n_convs=50, n_events=5_000, n_segments=5, seed=23)
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    for p in paths[:3]:
        shutil.copy(p, wal)

    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    run_incremental(lake, wal, segments_per_batch=2)  # batches [s0,s1],[s2]
    assert lake.last_segment_hwm("default") == os.path.basename(paths[2])

    for p in paths[3:]:
        shutil.copy(p, wal)  # WAL grows between runs
    run_incremental(lake, wal, segments_per_batch=2)  # must apply exactly s3,s4

    oracle = duckdb_replay_oracle(f"{src}/*.parquet")
    assert_states_equal(lake_state_pdf(lake), oracle)


def test_list_segments_natural_order(tmp_path):
    """Unpadded sequence numbers (segment=10 vs segment=2) must order
    numerically, not lexicographically (ADVICE r1, low)."""
    from trde703_openfoodfacts_etl_spark.streaming.pipeline import list_segments

    wal = tmp_path / "wal"
    for i in [1, 2, 10, 11, 3]:
        d = wal / f"segment={i}"
        d.mkdir(parents=True)
        (d / "part-0.parquet").touch()
    got = [int(p.split("segment=")[1].split("/")[0]) for p in list_segments(str(wal))]
    assert got == [1, 2, 3, 10, 11]


def test_two_streams_one_lake_interleaved(spark, tmp_path):
    """Two independent change feeds (own stream_ids, own batch-id spaces,
    own segment watermarks) merge into ONE lake: exactly-once holds per
    stream under interleaving and re-runs, and the final state is the
    global LWW over both feeds (cross-stream conflicts resolved by
    (ts, lsn), not by arrival order)."""
    from helpers import make_events

    from trde703_openfoodfacts_etl_spark.streaming.pipeline import run_incremental

    wal_a, wal_b = tmp_path / "wal_a", tmp_path / "wal_b"
    make_events(spark, [("I", 1, "c1", 0, "user", "a_v1", None, 100)]) \
        .coalesce(1).write.parquet(str(wal_a / "segment=0"))
    make_events(spark, [("U", 5, "c1", 0, "user", "a_v2", None, 300)]) \
        .coalesce(1).write.parquet(str(wal_a / "segment=1"))
    make_events(spark, [
        ("U", 3, "c1", 0, "user", "b_mid", None, 200),  # loses to a_v2 (ts)
        ("I", 4, "c2", 0, "user", "b_only", None, 150),
    ]).coalesce(1).write.parquet(str(wal_b / "segment=0"))

    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    # interleave: A's first segment, all of B, then A resumes its second
    m1 = run_incremental(lake, str(wal_a), stream_id="feed_a", max_batches=1)
    m2 = run_incremental(lake, str(wal_b), stream_id="feed_b")
    m3 = run_incremental(lake, str(wal_a), stream_id="feed_a")
    assert len(m1) == 1 and len(m2) == 1 and len(m3) == 1  # resumed exactly 1

    got = {(r.conv_id, r.turn_idx): r.text for r in lake.read().collect()}
    assert got == {("c1", 0): "a_v2", ("c2", 0): "b_only"}

    # re-running either feed is a per-stream no-op (independent markers)
    assert run_incremental(lake, str(wal_a), stream_id="feed_a") == []
    assert run_incremental(lake, str(wal_b), stream_id="feed_b") == []
    snap = lake.snapshot()
    assert snap["streams"]["feed_a"] == 1 and snap["streams"]["feed_b"] == 0
    assert "segment=1" in snap["stream_hwm"]["feed_a"]
    assert "segment=0" in snap["stream_hwm"]["feed_b"]


def test_vacuum_survives_and_sweeps_commit_temp_litter(spark, tmp_path):
    """Chaos-campaign regression: a writer killed between its CAS temp write
    and the link leaves snapshot-*.json.tmp.* in manifests/. vacuum must
    (a) not choke parsing it, (b) sweep it once it is old enough to be an
    orphan, (c) leave fresh temps for the in-flight writer."""
    import time

    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=4)
    apply_batch(lake, make_events(spark, [("I", 1, "c1", 0, "user", "a", None, 100)]), 0)
    apply_batch(lake, make_events(spark, [("U", 2, "c1", 0, "user", "b", None, 200)]), 1)
    mdir = os.path.join(str(tmp_path / "lake"), "manifests")
    stale = os.path.join(mdir, "snapshot-000000000099.json.tmp.123.dead")
    fresh = os.path.join(mdir, "snapshot-000000000099.json.tmp.456.live")
    for p in (stale, fresh):
        with open(p, "w") as f:
            f.write("{}")
    old = time.time() - 7200
    os.utime(stale, (old, old))
    lake.vacuum(keep_snapshots=1)  # must not raise
    assert not os.path.exists(stale)  # orphan swept
    assert os.path.exists(fresh)  # in-flight writer's temp untouched
    assert lake.read().select("text").first()[0] == "b"
