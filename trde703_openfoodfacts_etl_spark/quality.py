"""Quality report: per-batch and table-level gates, one aggregation pass.

Mirrors the reference's machine-readable JSON report
(etl/utils/quality.py:90-113, etl/quality_checks.py:143-205) — completeness /
uniqueness / validity / anomaly rates — but computes every metric in a single
``agg`` over conditional sums instead of the reference's ~20 separate
``count()`` actions that each recompute full lineage (SURVEY.md §2.4 A1).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def table_quality_report(df, snapshot_id: int | None = None) -> dict:
    """Table-level gates over the live lake state (transcript schema)."""
    blank = F.col("text").isNull() | (F.trim(F.col("text")) == "")
    row = df.select(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("conv_id").alias("conversations"),
        F.sum(F.when(blank, 1).otherwise(0)).alias("blank_text"),
        F.sum(F.when(F.col("role").isNull(), 1).otherwise(0)).alias("null_role"),
        F.sum(
            F.when(F.col("role").isin("user", "assistant", "system", "tool"), 0).otherwise(1)
        ).alias("invalid_role"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).alias("null_ts"),
        F.avg(F.length("text")).alias("avg_text_len"),
        F.max("turn_idx").alias("max_turn_idx"),
    ).first()
    rows = int(row["rows"]) or 0
    # uniqueness of the natural key — the reference's 100%-uniqueness gate
    # (docs/quality_rules.md:132-145); one extra aggregate, exact.
    dup = df.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).count()
    rpt = {
        "snapshot_id": snapshot_id,
        "rows": rows,
        "conversations": int(row["conversations"] or 0),
        "uniqueness": {
            "duplicate_keys": int(dup),
            "pct_unique": 100.0 if rows == 0 else round(100.0 * (1 - dup / rows), 4),
        },
        "completeness": {
            "blank_text": int(row["blank_text"] or 0),
            "null_role": int(row["null_role"] or 0),
            "null_ts": int(row["null_ts"] or 0),
            "score": 0.0
            if rows == 0
            else round(1.0 - (int(row["blank_text"] or 0) + int(row["null_role"] or 0)) / (2 * rows), 4),
        },
        "validity": {"invalid_role": int(row["invalid_role"] or 0)},
        "stats": {
            "avg_text_len": float(row["avg_text_len"] or 0.0),
            "max_turn_idx": int(row["max_turn_idx"] or 0),
        },
    }
    rpt["passed"] = dup == 0 and rpt["validity"]["invalid_role"] == 0
    return rpt


def write_report(report: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
