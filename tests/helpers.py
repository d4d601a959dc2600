from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd

from trde703_openfoodfacts_etl_spark.schema import CDC_SCHEMA, CDC_SCHEMA_V2


def ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def _nullable(schema):
    from pyspark.sql import types as T

    return T.StructType([T.StructField(f.name, f.dataType, True) for f in schema.fields])


def make_events(spark, rows, v2=False):
    """rows: (op, lsn, conv_id, turn_idx, role, text, tool, ts_sec[, tool_meta])."""
    schema = _nullable(CDC_SCHEMA_V2 if v2 else CDC_SCHEMA)
    recs = []
    for r in rows:
        op, lsn, conv, turn, role, text, tool, tsec = r[:8]
        rec = {
            "op": op,
            "lsn": lsn,
            "event_ts": ts(tsec + 1),
            "conv_id": conv,
            "turn_idx": turn,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts(tsec),
        }
        if v2:
            rec["tool_meta"] = r[8] if len(r) > 8 else None
        recs.append(rec)
    return spark.createDataFrame(recs, schema)


def duckdb_replay_oracle(segment_glob: str, extra_cols: list[str] | None = None) -> pd.DataFrame:
    """Naive single-pass LWW oracle over raw WAL segments (never the engine)."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"] + (extra_cols or [])
    q = f"""
        SELECT {', '.join(cols)}
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx
                ORDER BY coalesce(ts, TIMESTAMP '1970-01-01') DESC, lsn DESC) AS rn
            FROM read_parquet('{segment_glob}', union_by_name=true)
            WHERE conv_id IS NOT NULL AND conv_id <> '' AND turn_idx IS NOT NULL
        )
        WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
    """
    return duckdb.sql(q).df()


def lake_state_pdf(lake, cols=None) -> pd.DataFrame:
    cols = cols or ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return (
        lake.read()
        .select(*cols)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )


def assert_states_equal(engine: pd.DataFrame, oracle: pd.DataFrame):
    engine = engine.reset_index(drop=True)
    oracle = oracle.reset_index(drop=True)
    for df in (engine, oracle):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
            if c == "turn_idx":
                df[c] = df[c].astype("int64")
    pd.testing.assert_frame_equal(engine, oracle, check_dtype=False)
