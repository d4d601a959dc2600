"""Distributed exact-quantile operator vs Spark's builtin percentile()
(same quantile_cont semantics, but bounded per-task memory)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from trde703_openfoodfacts_etl_spark.operators.quantiles import exact_quantiles

PROBS = [0.0, 0.25, 0.5, 0.75, 0.95, 1.0]


def _builtin(df, group_cols, value_col, probs):
    arr = ", ".join(f"{p}D" for p in probs)
    out = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, array({arr}))").alias("_p")
    )
    res = {}
    for r in out.collect():
        g = tuple(r[c] for c in group_cols)
        for qi, v in enumerate(r["_p"]):
            res[(g, qi)] = v
    return res


def _ours(df, group_cols, value_col, probs, **kw):
    out = exact_quantiles(df, group_cols, value_col, probs, **kw)
    return {
        (tuple(r[c] for c in group_cols), r["_qi"]): r["_q"] for r in out.collect()
    }


def _compare(df, group_cols, value_col, probs=PROBS, **kw):
    want = _builtin(df, group_cols, value_col, probs)
    got = _ours(df, group_cols, value_col, probs, **kw)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12, abs=1e-12), k


def test_random_groups_with_ties(spark):
    rng = random.Random(7)
    rows = [
        (rng.choice("ABCD"), float(rng.choice([1, 2, 2, 3, 5, 5, 5, 8, 13])))
        for _ in range(5_000
        )
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    # many partitions: ranks cross partition boundaries constantly
    _compare(df, ["g"], "v", num_partitions=16)


def test_tiny_and_skewed_groups(spark):
    rows = (
        [("one", 42.0)]
        + [("two", v) for v in (10.0, 20.0)]
        + [("hot", float(i % 37)) for i in range(3_000)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    _compare(df, ["g"], "v", num_partitions=8)


def test_nulls_ignored_and_null_group_key(spark):
    rows = [("a", 1.0), ("a", None), ("a", 3.0), (None, 5.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    _compare(df, ["g"], "v", probs=[0.5])


def test_multi_column_group_and_int_values(spark):
    rng = random.Random(11)
    rows = [
        (rng.choice("xy"), rng.randrange(3), rng.randrange(1000))
        for _ in range(2_000)
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 int, v int")
    _compare(df, ["g1", "g2"], "v", num_partitions=8)


def test_plan_has_no_value_buffer_aggregate(spark):
    """The scale claim: no percentile() aggregate (per-group value buffer)
    and no single-task-per-group window anywhere in the job — the heavy
    stages are a range-partitioned sort and a mapInPandas extraction."""
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "g string, v double"
    )
    out = exact_quantiles(df, ["g"], "v", [0.5], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()
    assert "Window" not in plan
