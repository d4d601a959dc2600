"""Similarity search: exact brute-force baseline vs LSH / IVF approximate
paths (recall sanity on the driver's embeddings table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trde703_openfoodfacts_etl_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def probes(emb):
    return emb.filter(F.col("vec_id") < 8)


@pytest.fixture(scope="module")
def exact(emb, probes):
    rows = cosine_topk(emb, probes, k=10).collect()
    return {(r["probe_id"], r["neighbor_id"]) for r in rows}


def test_bruteforce_shape(emb, probes, exact):
    assert len(exact) == 8 * 10
    # self never appears
    assert all(p != n for p, n in exact)


def test_lsh_recall(emb, probes, exact):
    # synthetic near-uniform vectors are LSH-hostile (weak cluster structure):
    # short codes + many bands is the right operating point; recall ≥ 0.6
    got = {(r["probe_id"], r["neighbor_id"])
           for r in lsh_topk(emb, probes, k=10, dim=64, n_planes=4, bands=12).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_ivf_recall(emb, probes, exact):
    got = {(r["probe_id"], r["neighbor_id"])
           for r in ivf_topk(emb, probes, k=10, dim=64, n_cells=8, nprobe=4).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_exact_matches_duckdb(emb, probes, spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS FROM '{sf_dir}/embeddings.parquet'")
    want = con.sql(
        """
        WITH p AS (SELECT vec_id pid, embedding pe FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id nid, embedding ne FROM embeddings),
        s AS (SELECT pid, nid, list_cosine_similarity(pe, ne) cos
              FROM p, c WHERE pid <> nid),
        r AS (SELECT pid, nid, row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) rk
              FROM s)
        SELECT pid, nid FROM r WHERE rk <= 10
        """
    ).fetchall()
    con.close()
    got = {(r["probe_id"], r["neighbor_id"]) for r in cosine_topk(emb, probes, k=10).collect()}
    assert got == set(want)
