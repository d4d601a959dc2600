"""Shared engine-state signature for the campaign scripts.

chaos_replay, rebucket_bench, stream_resume and bigrun all compare the
lake's end state to a DuckDB oracle through the SAME aggregate — 4
components on the v1 schema, 6 when the evolved v2 feed (tool_meta) is in
play. One definition here so a future signature change cannot silently
diverge in meaning between benches (the evolved components already had to
be hand-added to one copy once).
"""

from __future__ import annotations


def engine_signature(lake, evolved: bool = False) -> list[int]:
    """[rows, distinct convs, total text chars, sum(turn_idx)] of the
    lake's live state (+ [tool_meta count, tool_meta chars] if evolved)."""
    from pyspark.sql import functions as F

    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("conv_id").alias("convs"),
        F.sum(F.length("text")).alias("chars"),
        F.sum("turn_idx").alias("turns"),
    ]
    if evolved:
        aggs += [
            F.count("tool_meta").alias("meta_n"),
            F.sum(F.length("tool_meta")).alias("meta_chars"),
        ]
    r = lake.read().agg(*aggs).first()
    out = [r["n"], r["convs"], int(r["chars"] or 0), int(r["turns"] or 0)]
    if evolved:
        out += [int(r["meta_n"] or 0), int(r["meta_chars"] or 0)]
    return out
