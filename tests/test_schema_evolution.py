"""Schema evolution: added column + widened type arriving mid-stream
(FIXTURES.md §3; generalizes the reference's missing-column tolerance,
etl/bronze_to_silver.py:59-181)."""

from __future__ import annotations

from pyspark.sql import types as T

from trde703_openfoodfacts_etl_spark.schema import (
    TRANSCRIPT_SCHEMA,
    merge_schemas,
    SchemaEvolutionError,
)
from trde703_openfoodfacts_etl_spark.sources.genfeed import generate_segments
from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable
from trde703_openfoodfacts_etl_spark.streaming.pipeline import run_incremental

from helpers import assert_states_equal, duckdb_replay_oracle, lake_state_pdf


def test_merge_schemas_add_and_widen():
    inc = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.LongType(), False),  # widened
            T.StructField("tool_meta", T.StringType(), True),  # added
        ]
    )
    unified, report = merge_schemas(TRANSCRIPT_SCHEMA, inc)
    by_name = {f.name: f for f in unified.fields}
    assert isinstance(by_name["turn_idx"].dataType, T.LongType)
    assert "tool_meta" in by_name and by_name["tool_meta"].nullable
    assert report["added"] == ["tool_meta:string"]
    assert report["widened"] == ["turn_idx:int->bigint"]
    # existing columns keep their positions (old readers unbroken)
    assert [f.name for f in unified.fields][:6] == [f.name for f in TRANSCRIPT_SCHEMA.fields]


def test_incompatible_types_hard_error():
    import pytest

    inc = T.StructType([T.StructField("turn_idx", T.StringType(), True)])
    with pytest.raises(SchemaEvolutionError):
        merge_schemas(TRANSCRIPT_SCHEMA, inc)


def test_mid_stream_evolution_replay(spark, tmp_path):
    wal = str(tmp_path / "wal")
    generate_segments(wal, n_convs=100, n_events=6_000, n_segments=3, seed=7,
                      v2_from_segment=2)
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, num_buckets=8)
    run_incremental(lake, wal, segments_per_batch=1)

    schema = lake.user_schema()
    by_name = {f.name: f for f in schema.fields}
    assert "tool_meta" in by_name
    assert isinstance(by_name["turn_idx"].dataType, T.LongType)

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_meta"]
    oracle = duckdb_replay_oracle(f"{wal}/*.parquet", extra_cols=["tool_meta"])
    assert_states_equal(lake_state_pdf(lake, cols), oracle)
    # rows written before the column existed read as typed nulls; some v2
    # winners carry real metadata
    st = lake_state_pdf(lake, cols)
    assert st["tool_meta"].isna().any()
    # evolution is recorded in the manifest (lineage)
    snap = lake.snapshot()
    assert any("tool_meta:string" in e["added"] for e in snap["evolution"])
