"""Hot-conversation skew (FIXTURES.md §2: one conversation ≥10× median) and
the t2-scale correctness corpus (FIXTURES.md §5: ~300k events, 10 segments,
mid-stream v2 schema)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from trde703_openfoodfacts_etl_spark.operators.merge import apply_batch
from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments
from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
from trde703_openfoodfacts_etl_spark.streaming.pipeline import run_incremental

from helpers import assert_states_equal, duckdb_replay_oracle, lake_state_pdf


def test_extreme_hot_key_skew(spark, tmp_path):
    """50% of all events hit ONE (conv_id, turn_idx) key: the partial-agg
    LWW must absorb it (map-side reduction), final state exact."""
    n = 40_000
    df = (
        spark.range(0, n)
        .select(
            F.lit("U").alias("op"),
            (F.col("id") + 1).alias("lsn"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("event_ts"),
            # ids 0..n/2 → the hot conversation/turn; rest spread out
            F.when(F.col("id") < n // 2, F.lit("hot_conv"))
            .otherwise(F.format_string("conv_%05d", F.col("id") % 500))
            .alias("conv_id"),
            F.when(F.col("id") < n // 2, F.lit(0))
            .otherwise((F.col("id") % 20).cast("int"))
            .cast("int")
            .alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("text_"), F.col("id")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        )
    )
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=8)
    m = apply_batch(lake, df, 0)
    st = lake_state_pdf(lake)
    hot = st[(st.conv_id == "hot_conv") & (st.turn_idx == 0)]
    # the winner is the greatest (ts, lsn) among the n/2 hot events
    assert hot["text"].tolist() == [f"text_{n // 2 - 1}"]
    assert m["events_in"] == n
    # hot key collapsed to a single stored row
    assert (st.conv_id == "hot_conv").sum() == 1


@pytest.mark.slow
def test_t2_scale_replay(spark, tmp_path):
    """t2 corpus: 5,000 conversations, ~300k events, 10 segments with the
    v2 schema arriving mid-stream; replay in 5 microbatches; exact equality
    vs the DuckDB oracle including evolved columns."""
    wal = str(tmp_path / "wal")
    generate_segments(wal, n_convs=5_000, n_events=300_000, n_segments=10, seed=42,
                      v2_from_segment=7)
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=16)
    metrics = run_incremental(lake, wal, segments_per_batch=2)
    assert len(metrics) == 5
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_meta"]
    oracle = duckdb_replay_oracle(f"{wal}/*.parquet", extra_cols=["tool_meta"])
    assert oracle.shape[0] > 50_000
    assert_states_equal(lake_state_pdf(lake, cols), oracle)
    # generator's conv 0 is Zipf-hot: sanity that skew actually existed
    per_conv = (
        lake.read().groupBy("conv_id").count().orderBy(F.desc("count")).limit(1).collect()
    )
    med = int(np.median(
        [r["count"] for r in lake.read().groupBy("conv_id").count().collect()]
    ))
    assert per_conv[0]["count"] >= 10 * max(med, 1)


def test_percentile_sketch_is_bounded_memory_plan(spark, sf_dir):
    """q46's aggregate must be the mergeable approx_percentile sketch (the
    100-TB path), never q35's whole-group value buffer, and its in-query
    rank-error verification must hold on real data."""
    from trde703_openfoodfacts_etl_spark.plans.analytics import (
        q35_percentiles,
        q46_percentile_sketch,
    )

    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    df = q46_percentile_sketch(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" in plan or "approx_percentile" in plan
    stripped = plan.replace("percentile_approx(", "").replace("approx_percentile(", "")
    assert "percentile(" not in stripped  # no whole-group value-buffer agg
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.p25_in_bound and r.p50_in_bound and r.p75_in_bound and r.p95_in_bound
    # and the sketch agrees with the exact form far tighter than the bound
    exact = {r.l_returnflag: (r.p25, r.p50, r.p75, r.p95)
             for r in q35_percentiles(spark, sf_dir).collect()}
    assert set(exact) == {r.l_returnflag for r in rows}
