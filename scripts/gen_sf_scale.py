#!/usr/bin/env python
"""Generate an sf1.0-APPROXIMATE dataset for round-6 PERF MEASUREMENT ONLY.

The driver measures rounds at a driver-generated sf (BENCH_r05.json: sf1.0)
that is not kept on disk between rounds. This script rebuilds a dataset of
the same scale and statistical shape from the real sf0.1 tables so that
optimizations can be measured at the scale the driver grades:

- star-schema + events tables: 10 copies of sf0.1 with shifted key spaces
  (per-copy key offset = copy * (max_key+1)), which preserves join
  selectivity, per-key fan-out, and value distributions exactly;
- documents: 50k fresh docs drawn from the learned sf0.1 corpus model
  (31-token uniform vocab, uniform 10-100 token lengths, lang/source
  marginals, ~10% planted near-dup mutations + ~0.2% exact duplicates);
- embeddings: 10 noisy clones per real vector (sigma=0.05 relative),
  preserving the 10-label cluster geometry.

NEVER used by bench.py, oracle_sql(), or any test: correctness and the
driver's own measurements always run on real driver-generated data. The
output goes under the gitignored _data/ tree.

Run:  python scripts/gen_sf_scale.py [factor=10] [out=/root/repo/_data/sf1.0]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 1042


def upscale_star(con: duckdb.DuckDBPyConnection, out: str, factor: int) -> None:
    plans = {
        # table: (shift exprs per copy c, passthrough cols)
        "customer": ("c_custkey + {c} * 15000 AS c_custkey",
                     ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]),
        "supplier": ("s_suppkey + {c} * 1000 AS s_suppkey",
                     ["s_name", "s_nationkey", "s_acctbal"]),
        "part": ("p_partkey + {c} * 20000 AS p_partkey",
                 ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
        "orders": ("o_orderkey + {c} * 150000 AS o_orderkey, "
                   "o_custkey + {c} * 15000 AS o_custkey",
                   ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]),
        "lineitem": ("l_orderkey + {c} * 150000 AS l_orderkey, "
                     "l_partkey + {c} * 20000 AS l_partkey, "
                     "l_suppkey + {c} * 1000 AS l_suppkey",
                     ["l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
                      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"]),
        # per-copy microsecond jitter keeps upscaled ts values distinct
        "events": ("event_id + {c} * 100000 AS event_id, "
                   "ts + INTERVAL ({c} * 37) MICROSECOND AS ts, "
                   "user_id + {c} * 1500 AS user_id",
                   ["event_type", "value", "props"]),
    }
    for t, (shift, passthrough) in plans.items():
        parts = []
        for c in range(factor):
            cols = shift.format(c=c) + ", " + ", ".join(passthrough)
            parts.append(f"SELECT {cols} FROM '{SRC}/{t}.parquet'")
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )


def gen_documents(con: duckdb.DuckDBPyConnection, out: str, factor: int) -> None:
    rows = con.sql(f"SELECT text, lang, source FROM '{SRC}/documents.parquet'").fetchall()
    vocab = sorted({tok for text, _, _ in rows for tok in text.split()})
    langs, sources = zip(*[(l, s) for _, l, s in rows])
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    src_vals, src_counts = np.unique(sources, return_counts=True)
    rng = np.random.default_rng(SEED)
    n = len(rows) * factor
    texts: list[str] = []
    i = 0
    while len(texts) < n:
        r = rng.random()
        if texts and r < 0.002:  # exact duplicate
            texts.append(texts[rng.integers(0, len(texts))])
        elif texts and r < 0.10:  # near-dup mutation of an earlier doc
            toks = texts[rng.integers(0, len(texts))].split()
            n_mut = max(1, int(len(toks) * rng.uniform(0.03, 0.15)))
            for pos in rng.choice(len(toks), size=n_mut, replace=False):
                toks[pos] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(toks))
        else:  # fresh token soup
            length = rng.integers(10, 101)
            texts.append(" ".join(vocab[j] for j in rng.integers(0, len(vocab), length)))
        i += 1
    lang = rng.choice(lang_vals, size=n, p=lang_counts / lang_counts.sum())
    source = rng.choice(src_vals, size=n, p=src_counts / src_counts.sum())
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(lang),
        "source": pa.array(source),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")
    print("documents", n)


def gen_embeddings(con: duckdb.DuckDBPyConnection, out: str, factor: int) -> None:
    df = con.sql(f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'").df()
    base = np.stack(df["embedding"].to_numpy())  # (n, 64) float32
    n0 = base.shape[0]
    rng = np.random.default_rng(SEED + 1)
    vecs, ids, labels = [], [], []
    for c in range(factor):
        noise = rng.normal(0.0, 0.05, size=base.shape).astype(np.float32) if c else 0.0
        vecs.append((base + noise).astype(np.float32))
        ids.append(df["vec_id"].to_numpy() + c * n0)
        labels.append(df["label"].to_numpy())
    allv = np.concatenate(vecs)
    tbl = pa.table({
        "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(allv.reshape(-1), type=pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(labels), type=pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print("embeddings", allv.shape[0])


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_data/sf1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    upscale_star(con, out, factor)
    gen_documents(con, out, factor)
    gen_embeddings(con, out, factor)
    open(os.path.join(out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
