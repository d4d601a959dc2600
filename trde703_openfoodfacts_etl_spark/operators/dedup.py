"""Deduplication family for training-data pipelines.

Scalable designs only: every method reduces to hash-groupBy or
bucket-equi-join shapes — never an O(n²) cross join — so they survive
100 TB corpora on a real cluster. (The reference's only dedup is LWW/
dropDuplicates, SURVEY.md §2.4 A5; these generalize to content dedup.)

- exact: groupBy(md5(normalized text)) — one shuffle on a 128-bit key.
- n-gram Jaccard: word-shingle inverted index join; candidate pairs share
  ≥1 shingle, verified by exact Jaccard on shingle-set sizes. JVM-side
  higher-order functions (transform/slice/array_distinct), no UDF.
- MinHash + LSH: k hash functions over shingles (universal hashing of
  xxhash64 shingle hashes — all columnar expressions), banded into b bands;
  docs sharing a band bucket are candidates → verified with signature
  similarity. One explode + two shuffles, never pairwise over the corpus.
- SimHash: 64-bit signature (vectorized pandas UDF, functions/text.py),
  near-dups = equal 16-bit chunk (Hamming ≤ 3 in expectation) → band join.
- embedding cosine near-dup: random-hyperplane LSH buckets (see
  operators/similarity.py) + in-bucket verification.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import spread as _spread
from ..functions.text import fingerprint_expr, simhash64


def exact_duplicates(df, text_col: str = "text", id_col: str = "doc_id"):
    """Groups of byte-identical (modulo case/whitespace) documents.

    No spread(): the per-row work is ONE normalize+md5, which a single
    core clears faster than the extra round-robin stage costs (r6 A/B:
    spread 1.47 s vs 0.74 s at a 50k-doc single-row-group corpus)."""
    return (
        df.groupBy(fingerprint_expr(F.col(text_col)).alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper"),
            F.collect_list(id_col).alias("members"),
        )
        .filter(F.col("n_copies") > 1)
    )


def word_shingles(col, n: int = 3):
    """Distinct word n-grams as an array column — pure higher-order fns.

    The tokenization is bound ONCE into a lambda scope
    (``transform(array(toks), t -> ...)``): Catalyst does not
    common-subexpression-eliminate through lambda functions, so referencing
    the split/regexp expression directly inside the per-index gram lambda
    re-tokenizes the document once per gram — O(len²) regex work per row
    (measured 7s for 5k docs; ~50× the bound-variable form)."""

    def shingles_of(t):
        cnt = F.size(t)
        idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
        # n is a plan-time Python int, so the gram is n O(1) element_at
        # lookups — the slice() form allocated a fresh n-element array per
        # gram inside the interpreted lambda (r6: the shingle build alone
        # was 1.5 s at a 50k-doc corpus; ~2× cheaper this way). concat_ws
        # over the looked-up elements produces byte-identical grams.
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(t, i + k + 1) for k in range(n)]
        )
        return F.when(cnt < n, F.array(F.concat_ws(" ", t))).otherwise(
            F.array_distinct(F.transform(idx, gram))
        )

    toks = F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")
    return F.element_at(F.transform(F.array(toks), shingles_of), 1)


def ngram_jaccard_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.8,
                        max_doc_freq: int | None = None,
                        prefix_filter: bool = True,
                        broadcast_candidates: bool = True,
                        broadcast_dfreq: bool = False):
    """All pairs with word-n-gram Jaccard ≥ threshold. EXACT output.

    Scale shape = prefix-filtered similarity join (Bayardo et al. AllPairs /
    SSJoin): rank each document's shingles by ascending global document
    frequency and index only the first ``floor((1-t)·|A|) + 1`` of them —
    if two sets share NO shingle in either prefix, their Jaccard is provably
    < t (pigeonhole on the overlap needed for J ≥ t), so the filter is
    LOSSLESS. Candidates therefore collide only on *rare* shingles: the
    quadratic posting-list blowup on hot boilerplate shingles disappears
    without giving up exactness. Candidates are then verified with the
    exact Jaccard via one shingle-array join. A length filter
    (t·|B| ≤ |A|) prunes mismatched sizes before verification.

    ``max_doc_freq`` optionally also drops ultra-hot shingles from the
    *verification-independent* candidate index (approximation; off by
    default — the prefix filter already bounds hot-shingle fanout).
    ``prefix_filter=False`` falls back to the plain inverted-index join
    (useful for tiny corpora / debugging).

    ``broadcast_dfreq=True`` broadcasts the per-shingle document-frequency
    table into the prefix-ranking join, removing the postings' shuffle by
    shingle hash (r6: −0.7 s of q21 at a 50k-doc corpus). Caller
    knowledge, OFF by default: the df table has one row per DISTINCT
    shingle, which is unbounded on an open-vocabulary corpus (billions of
    shingles at 100 TB → broadcast OOM) but tightly bounded when the
    caller knows the vocabulary is small (the bench corpus draws from a
    31-token vocabulary, ≤ ~30k distinct 3-gram shingles at ANY scale
    factor).
    """
    df = _spread(df)  # single-row-group inputs: shingle on every core
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), n).alias("_sh"),
    ).withColumn("_size", F.size("_sh"))
    ex = sh.select("_id", "_size", F.explode("_sh").alias("_g")).withColumn(
        "_gh", F.xxhash64("_g")
    ).drop("_g")
    # The exploded set feeds BOTH the document-frequency aggregate and the
    # prefix join (and, in plain mode, both join sides): materialize it once
    # — three longs per (doc, shingle), so storage is ~24 B/shingle — or the
    # regex shingling of the WHOLE corpus re-runs per consumer. Same
    # executor-local-persist tradeoff as the candidate list below. Measured
    # ~30% off q21 wall at sf0.1 with exact pair parity.
    ex = ex.localCheckpoint(eager=False)
    if max_doc_freq is not None:
        keep = (
            ex.groupBy("_gh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("_gh")
        )
        ex = ex.join(keep, "_gh")
    if prefix_filter:
        dfreq = ex.groupBy("_gh").agg(F.count(F.lit(1)).alias("_df"))
        if broadcast_dfreq:
            dfreq = F.broadcast(dfreq)
        wdoc = W.partitionBy("_id").orderBy("_df", "_gh")
        prefix_len = F.floor((1.0 - threshold) * F.col("_size")).cast("int") + 1
        ex = (
            ex.join(dfreq, "_gh")
            .withColumn("_rk", F.row_number().over(wdoc))
            .filter(F.col("_rk") <= prefix_len)
            .select("_id", "_size", "_gh", "_rk")
        )
    else:
        ex = ex.withColumn("_rk", F.lit(None).cast("int"))
    a = ex.select(
        F.col("_id").alias("id_a"), F.col("_size").alias("size_a"), "_gh",
        F.col("_rk").alias("_rka"),
    )
    b = ex.select(
        F.col("_id").alias("id_b"), F.col("_size").alias("size_b"), "_gh",
        F.col("_rk").alias("_rkb"),
    )
    # PPJoin positional filter (lossless): a prefix collision at sorted
    # positions (i, j) bounds the overlap by 1 + min(|A|−i, |B|−j); Jaccard
    # ≥ t needs overlap ≥ t/(1+t)·(|A|+|B|). Prunes most length-compatible
    # but content-disjoint candidates BEFORE the dedup + verify joins.
    overlap_needed = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("size_a") + F.col("size_b"))
    )
    positional_ok = (
        F.lit(1)
        + F.least(
            F.col("size_a") - F.col("_rka"), F.col("size_b") - F.col("_rkb")
        )
    ) >= overlap_needed
    if prefix_filter:
        # 256-bit per-doc shingle bitmap → a SECOND lossless overlap upper
        # bound, evaluated per collision row inside the candidate join
        # (bit_count on 4 longs — codegen, ~ns/pair). Pigeonhole: common
        # shingles occupy ≥ o − (|A| − popcount(bmA)) distinct bit
        # positions (within-A same-bit multiplicity bounds the common
        # set's), and every such position survives in bmA & bmB, so
        #   o ≤ popcount(bmA & bmB) + min(|A|−popcount(bmA), |B|−popcount(bmB)).
        # Exact for ANY hash (collisions only weaken pruning, never drop a
        # true pair). At low thresholds (t=0.5 ⇒ prefixes are half the
        # doc) the positional filter alone passes millions of single-rare-
        # shingle coincidences — ~19M candidate pairs at a 50k-doc corpus,
        # 28 s of array_intersect verification; the bitmap bound kills
        # chance collisions (expected AND-popcount ≈ |A|·|B|/256 bits ≪
        # o_needed) so only true near-dups reach the exact verify.
        _words = 4  # 256 bits
        _bm_aggs = [
            F.bit_or(
                F.when(
                    F.expr("pmod(_gh, 256) div 64") == w,
                    F.expr("shiftleft(1L, cast(pmod(_gh, 64) as int))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias(f"_bm{w}")
            for w in range(_words)
        ]
        bm = ex.groupBy("_id").agg(*_bm_aggs)
        bm = bm.withColumn(
            "_pc", sum(F.bit_count(F.col(f"_bm{w}")) for w in range(_words))
        )
        a = a.join(
            bm.select(
                F.col("_id").alias("id_a"), F.col("_pc").alias("_pca"),
                *[F.col(f"_bm{w}").alias(f"_a{w}") for w in range(_words)],
            ),
            "id_a",
        )
        b = b.join(
            bm.select(
                F.col("_id").alias("id_b"), F.col("_pc").alias("_pcb"),
                *[F.col(f"_bm{w}").alias(f"_b{w}") for w in range(_words)],
            ),
            "id_b",
        )
        pc_and = sum(
            F.bit_count(F.col(f"_a{w}").bitwiseAND(F.col(f"_b{w}")))
            for w in range(_words)
        )
        bitmap_ok = (
            pc_and
            + F.least(
                F.col("size_a") - F.col("_pca"), F.col("size_b") - F.col("_pcb")
            )
        ) >= overlap_needed
    else:
        bitmap_ok = F.lit(True)
    cand = (
        a.join(b, "_gh")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length filter: J ≥ t needs t·max(|A|,|B|) ≤ min(|A|,|B|)
            & (F.least("size_a", "size_b")
               >= threshold * F.greatest("size_a", "size_b"))
            & (positional_ok if prefix_filter else F.lit(True))
            & bitmap_ok
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if not prefix_filter:
        # plain mode: every common shingle is indexed, count directly
        common = (
            a.join(b, "_gh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "size_a", "size_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        jac = F.col("n_common") / (
            F.col("size_a") + F.col("size_b") - F.col("n_common")
        )
        return (
            common.withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    # Verification only needs the shingle arrays of CANDIDATE docs — a tiny
    # set after prefix filtering. Semi-join the raw docs down to candidates
    # first, then shingle just those. cand feeds two consumers (the id set
    # and the final join); localCheckpoint materializes the small candidate
    # list once instead of re-running the whole prefix pipeline per consumer
    # (storage is executor-local and freed with the DataFrame; on a
    # dynamic-allocation cluster where executor loss must be survivable,
    # swap for reliable .checkpoint() or accept the recompute).
    cand = cand.localCheckpoint(eager=False)
    cids = (
        cand.select(F.col("id_a").alias("_id"))
        .union(cand.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    # Candidate ids are broadcast on the fast path. CAVEAT for extreme
    # corpora: the candidate set is not theoretically bounded (boilerplate-
    # heavy corpora can implicate most docs); pass
    # ``broadcast_candidates=False`` there to use a shuffle semi-join —
    # AQE cannot size the checkpoint-backed subplan up front, so this is an
    # explicit knob rather than a runtime decision.
    if broadcast_candidates:
        cids = F.broadcast(cids)
    csh = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .join(cids, "_id", "left_semi")
        .select("_id", word_shingles(F.col("_t"), n).alias("_sh"))
    )
    sa = csh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    sb = csh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(df, text_col: str = "text", id_col: str = "doc_id",
                       num_hashes: int = 64, shingle_n: int = 3):
    """MinHash signature per document, fully columnar.

    h_i(s) = (a_i * h31(s) + b_i) mod p over each shingle, with
    h31 = xxhash64 reduced into a 31-bit prime field so a_i*h31+b_i stays
    inside 64-bit integer math (no decimal/overflow). The signature is the
    per-document min of each h_i: one explode + one groupBy(min × k) —
    partial aggregation makes it skew-proof, and a_i/b_i are plan literals
    (no driver loop at runtime)."""
    import numpy as np

    P = 2147483647  # 2^31 - 1 (Mersenne prime field)
    # deterministic hash-family parameters (seeded linear congruential walk)
    params = []
    a, b = 0x9E3779B9, 0x7F4A7C15
    for i in range(num_hashes):
        a = (a * 1103515245 + 12345) % P
        b = (b * 1103515245 + 12345) % P
        params.append((a or 1, b))
    ex = (
        _spread(df)
        .select(F.col(id_col).alias("_id"), word_shingles(F.col(text_col), shingle_n).alias("_sh"))
        .select("_id", F.explode("_sh").alias("_g"))
        .select("_id", F.pmod(F.xxhash64("_g"), F.lit(P)).alias("_h"))
    )
    # The k-way min itself runs as ONE numpy matrix op per Arrow batch
    # (guide §4.2): the former 64-column `min(pmod(aᵢ·h+bᵢ, P))` hash
    # aggregate updates 64 buffer slots per posting — 1.7e8 interpreted-agg
    # ops at a 50k-doc corpus, 8.6 s of q24 — while (h⊗a + b) mod P is a
    # (batch × k) int64 broadcast-multiply plus a stable-sort segment-min
    # (`np.minimum.reduceat`). a·h < 2^62 so int64 never overflows and the
    # values are bit-identical to the JVM expression. Each partition emits
    # per-doc partial minima (explode keeps a doc's postings contiguous, so
    # ≤1 doc per partition straddles a batch — the dict accumulator stays
    # O(docs/partition)); a final min-aggregate merges straddlers, which
    # also makes the result partitioning-independent.
    a_arr = np.array([p[0] for p in params], dtype=np.int64)
    b_arr = np.array([p[1] for p in params], dtype=np.int64)
    out_schema = ", ".join(["_id long"] + [f"mh_{i} long" for i in range(num_hashes)])

    def _seg_min(batches):
        import pandas as pd

        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            h = pdf["_h"].to_numpy(dtype=np.int64)
            m = (h[:, None] * a_arr[None, :] + b_arr[None, :]) % P
            order = np.argsort(ids, kind="stable")
            ids_s, m_s = ids[order], m[order]
            starts = np.flatnonzero(
                np.concatenate(([True], ids_s[1:] != ids_s[:-1]))
            )
            reduced = np.minimum.reduceat(m_s, starts, axis=0)
            for did, row in zip(ids_s[starts], reduced):
                prev = acc.get(did)
                acc[did] = row if prev is None else np.minimum(prev, row)
        if acc:
            keys = list(acc)
            mat = np.stack([acc[k] for k in keys])
            yield pd.DataFrame(
                {"_id": keys, **{f"mh_{i}": mat[:, i] for i in range(num_hashes)}}
            )

    partial = ex.mapInPandas(_seg_min, out_schema)
    return (
        partial.groupBy("_id")
        .agg(*[F.min(f"mh_{i}").alias(f"mh_{i}") for i in range(num_hashes)])
        .withColumnRenamed("_id", id_col)
    )


def minhash_lsh_candidates(sig, id_col: str = "doc_id",
                           num_hashes: int = 64, bands: int = 16):
    """Candidate pairs from banded LSH over precomputed signatures.

    Only (id, band-bucket hash) rides the band explode — 16 bytes/row — not
    the full signature (which would amplify the shuffle by bands × num_hashes
    × 8 B per doc; at 100 TB that's the whole job). Signatures are re-joined
    onto the *deduplicated candidate set* by the caller if needed."""
    rows = num_hashes // bands
    buckets = sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(*[
                F.xxhash64(F.lit(bi), *[F.col(f"mh_{bi * rows + r}") for r in range(rows)])
                for bi in range(bands)
            ])
        ).alias("_bucket"),
    )
    a = buckets.select(F.col("_id").alias("id_a"), "_bucket")
    b = buckets.select(F.col("_id").alias("id_b"), "_bucket")
    return (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])  # same pair may collide in many bands
    )


def minhash_lsh_pairs(df, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.5, shingle_n: int = 3):
    """Near-duplicate pairs via banded MinHash LSH.

    bands × rows (rows = num_hashes/bands); docs agreeing on all rows of any
    band collide → candidates (shuffle on band-bucket hash); candidates are
    verified by estimated Jaccard = fraction of matching signature
    components, joined onto the deduped candidate set (signatures never ride
    the band explode). Tune bands/rows for the target s ≈ (1/b)^(1/r)."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    cand = minhash_lsh_candidates(sig, id_col, num_hashes, bands)
    sigs = sig.select(
        F.col(id_col).alias("_sid"),
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("_sig"),
    )
    paired = (
        cand.join(sigs.withColumnRenamed("_sid", "id_a").withColumnRenamed("_sig", "sig_a"),
                  "id_a")
        .join(sigs.withColumnRenamed("_sid", "id_b").withColumnRenamed("_sig", "sig_b"),
              "id_b")
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(float(num_hashes))
    )
    return (
        paired.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_near_dups(df, text_col: str = "text", id_col: str = "doc_id",
                      chunks: int = 4, max_hamming: int | None = None):
    """SimHash near-dup candidates: equal 16-bit chunk of the 64-bit
    signature (pigeonhole: Hamming ≤ chunks-1 guarantees ≥1 equal chunk).
    Returns candidate pairs with exact Hamming distance.

    ``max_hamming`` pushes the caller's Hamming threshold INSIDE the
    operator, before the pair dedup: the distance is a pure function of
    the two signatures, so filter-then-dedup ≡ dedup-then-filter — but the
    filtered form dedups only the near-dup pairs instead of shuffling
    every chunk collision (~19M pairs at a 50k-doc corpus, 22 s of the old
    q25). The signature frame is locally checkpointed so the pandas UDF
    runs one pass, not once per join side, and chunk buckets are packed
    into a long ((chunk_idx << 16) | value — bijective for 16-bit chunks)
    so the join keys are primitive."""
    sig = _spread(df).select(
        F.col(id_col).alias("_id"), simhash64(F.col(text_col)).alias("_sig")
    )
    # one UDF pass: sig feeds both join sides (same executor-local-persist
    # tradeoff as ngram_jaccard_pairs' postings)
    sig = sig.localCheckpoint(eager=False)
    width = 64 // chunks
    # bitwiseAND, not %: Spark's % follows the dividend's sign, so a negative
    # signature's chunk 0 (shift by 0 keeps the sign) would get a negative
    # remainder and miss collisions with positive-signature docs.
    chunk_cols = [
        (
            F.lit(c << width)
            + F.shiftrightunsigned(F.col("_sig"), c * width)
            .bitwiseAND(F.lit((1 << width) - 1))
        ).cast("long").alias(f"ck_{c}")
        for c in range(chunks)
    ]
    ex = sig.select("_id", "_sig", F.explode(F.array(*chunk_cols)).alias("_bucket"))
    a = ex.select(F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"), "_bucket")
    b = ex.select(F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"), "_bucket")
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    pairs = (
        a.join(F.broadcast(b), "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
    )
    if max_hamming is not None:
        pairs = pairs.filter(F.col("hamming") <= max_hamming)
    return pairs.dropDuplicates(["id_a", "id_b"])


def _free_local_checkpoint(df) -> None:
    """Deterministically release a locally-checkpointed DataFrame's blocks.

    ``DataFrame.unpersist()`` only clears cache-manager entries, not the
    internal RDD a localCheckpoint pins, and waiting for JVM GC + the
    ContextCleaner leaves up to max_iter label snapshots resident. The
    analyzed plan of a checkpointed frame is a ``LogicalRDD`` whose ``rdd``
    IS the pinned RDD — unpersist that. Best-effort: under Spark Connect
    (no ``_jdf``) or a future plan-shape change this degrades to the old
    GC-eventually behavior instead of failing the job — but observably:
    the first failure logs a warning (so the silent-block-leak mode is
    visible in driver logs) and ``_free_local_checkpoint.failures`` counts
    every one (assertable from tests / pollable from a maintenance loop).
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as e:  # noqa: BLE001 — cleanup must never fail the job
        _free_local_checkpoint.failures += 1
        if _free_local_checkpoint.failures == 1:
            import logging

            logging.getLogger(__name__).warning(
                "localCheckpoint block release unavailable (%s: %s); "
                "falling back to GC-eventually block cleanup — per-round "
                "label snapshots stay resident until the ContextCleaner "
                "runs", type(e).__name__, e,
            )


_free_local_checkpoint.failures = 0


def connected_components(edges, src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 50, method: str = "label_propagation",
                         stats: dict | None = None):
    """Connected components over an undirected edge list — the cluster
    step of document dedup (near-dup PAIRS → dedup GROUPS, so one
    representative per group survives). Returns (id, cluster_id) with
    cluster_id = the component's minimum node id (canonical, algorithm-
    independent).

    Spark has no built-in CC, so both methods are driver-coordinated
    DataFrame loops with per-round eager localCheckpoints (without lineage
    truncation the plan would grow 3x per round — labels feeds the message
    join, the union, and the changed-count join):

    - ``label_propagation`` (default): Pregel-shaped min-label flood — each
      round sends every node's label to its neighbors and keeps the min.
      ONE shuffle join per round; rounds = graph diameter. The right cost
      model for near-dup clusters, which are shallow (diameter 2–4).
    - ``pointer_doubling``: adds a shortcut step — label'(v) =
      min(label(v), min-neighbor label, label(label(v))). The self-join
      halves the remaining distance to the component minimum each round
      (path-doubling), so convergence is O(log d): a 10k-node chain closes
      in ~14 rounds instead of 10k. TWO shuffle joins per round, so it only
      wins when diameter ≫ 2·rounds — adversarial chain-shaped graphs.
      Correctness: label(v) is always a node id inside v's component
      (shortcutting composes reachability), and the fixpoint condition is
      identical to label_propagation's, so both converge to the same
      canonical minima.

    Convergence is detected with a count of changed labels (an aggregate,
    never a collect of the labels themselves); ``stats``, when passed, gets
    ``{"rounds": n}`` recorded for observability/tests.

    Not expressible as one SQL query in Spark — the DuckDB oracle uses a
    recursive CTE (UNION-deduped label reachability) and must agree
    exactly: CC is unique for a given graph regardless of algorithm.
    """
    if method not in ("label_propagation", "pointer_doubling"):
        raise ValueError(f"connected_components: unknown method {method!r}")
    a, b = F.col(src).alias("a"), F.col(dst).alias("b")
    # Materialize the symmetric edge list ONCE: it is consumed every round
    # (and its upstream plan — e.g. the whole near-dup similarity join in
    # q59 — would otherwise re-execute twice per iteration). Same
    # executor-local-persist tradeoff as ngram_jaccard_pairs' postings.
    sym = (
        edges.select(a, b)
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)
    changed = 0
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neigh = (
            sym.join(labels, sym["a"] == labels["id"])
            .select(F.col("b").alias("id"), F.col("label"))
        )
        candidates = labels.select("id", "label").union(neigh)
        if method == "pointer_doubling":
            # shortcut: v adopts its label's label. labels covers every
            # node id and label(v) IS a node id, so the inner join is total.
            shortcut = (
                labels.alias("x")
                .join(labels.alias("y"), F.col("x.label") == F.col("y.id"))
                .select(F.col("x.id").alias("id"), F.col("y.label").alias("label"))
            )
            candidates = candidates.union(shortcut)
        new_labels = (
            candidates.groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the changed-count action above is the last consumer of the OLD
        # round's snapshot — free its blocks now, or executor storage holds
        # up to max_iter full label snapshots for the life of the job
        _free_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    if changed != 0:
        # Returning here would hand back NON-minimal labels (one component
        # reported as several clusters) with no indication — fail loudly;
        # diameter > max_iter means the caller should raise max_iter (or
        # switch to pointer-doubling, which converges in O(log d) rounds).
        # The raise path frees its checkpoints too: the error message
        # invites catch-and-retry, and a retry loop must not accumulate
        # pinned edge-list + label snapshots per failed attempt.
        _free_local_checkpoint(labels)
        _free_local_checkpoint(sym)
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} rounds "
            f"({changed} labels still changing — graph diameter exceeds "
            "max_iter); raise max_iter or use method='pointer_doubling'"
        )
    # the returned frame is backed by its own checkpoint; the edge list is
    # no longer needed
    _free_local_checkpoint(sym)
    return labels.select("id", F.col("label").alias("cluster_id"))
