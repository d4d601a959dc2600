"""Dedup family: exact, n-gram Jaccard, MinHash LSH, SimHash — planted
duplicates must be found, non-duplicates must not collide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trde703_openfoodfacts_etl_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dups,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across the cluster and merges change events into the lake"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, "The  QUICK brown fox " + BASE[20:]),  # case/ws variant of 0
        (3, BASE.replace("lazy", "sleepy")),  # near dup (1 token changed)
        (4, "completely different content about databases and query optimizers "
            "with columnar storage vectorized execution and cost based planning"),
        (5, "yet another unrelated document mentioning streams watermarks "
            "state stores and exactly once processing guarantees in flink"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_copies"] == 3 and g["keeper"] == 0  # 0, 1, and the case/ws variant 2
    assert sorted(g["members"]) == [0, 1, 2]


def test_word_shingles_short_text(spark):
    df = spark.createDataFrame([(1, "only two")], ["doc_id", "text"])
    [row] = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()
    assert row["s"] == ["only two"]  # shorter than n → whole text as one shingle


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 3)] >= 0.5  # one-token edit keeps most shingles
    assert (0, 4) not in pairs and (4, 5) not in pairs


def test_ngram_jaccard_shuffle_path_parity(spark, docs):
    """broadcast_candidates=False (shuffle semi-join for unbounded candidate
    sets) must produce the identical pair set as the broadcast fast path."""
    fast = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    shuf = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                docs, threshold=0.5, broadcast_candidates=False).collect()}
    assert fast == shuf and (0, 1) in shuf


def test_minhash_estimates_jaccard(spark, docs):
    sig = minhash_signatures(docs, num_hashes=64).collect()
    assert len(sig) == 6 and len([c for c in sig[0].asDict() if c.startswith("mh_")]) == 64
    by_id = {r["doc_id"]: [r[f"mh_{i}"] for i in range(64)] for r in sig}
    assert by_id[0] == by_id[1]  # identical docs → identical signatures
    sim03 = sum(a == b for a, b in zip(by_id[0], by_id[3])) / 64
    sim04 = sum(a == b for a, b in zip(by_id[0], by_id[4])) / 64
    assert sim03 > 0.5 > sim04  # near-dup ≫ unrelated


def test_minhash_lsh_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 3) in pairs
    assert (0, 4) not in pairs


def test_simhash_near_dups(spark, docs):
    res = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dups(docs).collect()}
    assert res[(0, 1)] == 0
    if (0, 3) in res:
        assert res[(0, 3)] <= 16
    assert (0, 4) not in res or res[(0, 4)] > 10


def test_connected_components_multihop(spark):
    """Min-label propagation must traverse chains (diameter > 1), keep
    disjoint components apart, and produce the canonical min-id labels."""
    from trde703_openfoodfacts_etl_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain: component {1,2,3,4}
         (10, 11),                    # pair component
         (20, 21), (21, 22), (20, 22)],  # triangle
        "id_a long, id_b long",
    )
    got = {r.id: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_raises_when_not_converged(spark):
    """A diameter larger than max_iter must fail loudly — silently
    returning non-minimal labels would report one component as several."""
    import pytest

    from trde703_openfoodfacts_etl_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(chain, max_iter=2)
    # and with enough rounds the same chain converges to one cluster
    got = connected_components(chain, max_iter=50)
    assert {r.cluster_id for r in got.collect()} == {0}


def test_pointer_doubling_matches_label_propagation(spark):
    """Both CC methods must land on identical canonical min-id labels —
    components are unique for a given graph regardless of algorithm."""
    import random

    from trde703_openfoodfacts_etl_spark.operators.dedup import connected_components

    rng = random.Random(7)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    lp = {r.id: r.cluster_id for r in connected_components(df).collect()}
    pd_ = {
        r.id: r.cluster_id
        for r in connected_components(df, method="pointer_doubling").collect()
    }
    assert lp == pd_


def test_pointer_doubling_long_chain_logarithmic(spark):
    """The long-chain fixture (VERDICT r3 item 4): a 10k-node path graph has
    diameter 10k — label propagation would need 10k rounds — but pointer
    doubling halves the remaining distance to the component minimum every
    round, so it must close in ~log2(10k) rounds and still produce the
    canonical all-zero labels. Exact model: neighbor-min and shortcut both
    read the round's INPUT labels, so covered distance is 2^(r-1) — all
    labels minimal after round 15 (2^14 > 9999), plus one zero-change
    confirmation round = 16."""
    from pyspark.sql import functions as F

    from trde703_openfoodfacts_etl_spark.operators.dedup import connected_components

    n = 10_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats: dict = {}
    got = connected_components(
        chain, max_iter=20, method="pointer_doubling", stats=stats
    )
    assert stats["rounds"] <= 16, stats
    agg = got.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("cluster_id").alias("k"),
        F.max("cluster_id").alias("mx"),
    ).first()
    assert (agg.n, agg.k, agg.mx) == (n, 1, 0)


def test_ngram_jaccard_bitmap_filter_lossless_on_repetitive_corpus(spark):
    """r6: the 256-bit bitmap overlap bound added to the prefix path must
    keep every true pair even when per-doc bit collisions are maximal —
    repetitive docs built from a tiny shared vocabulary (all shingles land
    on few bit positions, so |A| − popcount(bmA) is large) compared against
    the exact brute-force Jaccard over the same shingle sets."""
    import itertools

    from trde703_openfoodfacts_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
        word_shingles,
    )

    # 12 docs over a 6-word vocabulary: dense overlap structure, many
    # near-dup pairs at t=0.5, heavy shingle re-use across docs
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = []
    for i in range(12):
        words = [vocab[(i + j) % 6] for j in range(8)] + [vocab[i % 6]] * (i % 3)
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    sh = {
        r["doc_id"]: set(r["s"])
        for r in df.select("doc_id", word_shingles(F.col("text"), 3).alias("s")).collect()
    }
    want = {}
    for x, y in itertools.combinations(sorted(sh), 2):
        j = len(sh[x] & sh[y]) / len(sh[x] | sh[y])
        if round(j, 6) >= 0.5:
            want[(x, y)] = round(j, 6)
    assert set(got) == set(want) and want
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_ngram_jaccard_dfreq_broadcast_parity(spark, docs):
    """r6: broadcast_dfreq only changes the prefix join's physical shape;
    the pair set must be identical to the shuffle-join default."""
    base = {(r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    bcast = {(r.id_a, r.id_b, r.jaccard)
             for r in ngram_jaccard_pairs(
                 docs, threshold=0.5, broadcast_dfreq=True).collect()}
    assert base == bcast and base
