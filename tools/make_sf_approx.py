"""Approximate-sf test-data generator for LOCAL measurement only.

The driver's generator is external; /root/testdata ships only
sf{0.001,0.01,0.1}.  Optimization work needs the driver's bench scale
(sf1.0 in BENCH_r05.json), so this tool extrapolates the published sf
dirs: scalar tables are bootstrapped row-wise from sf0.1 (joint
distributions preserved) with keys rewritten to the larger ranges;
documents are regenerated fresh from the measured 31-word unigram
distribution and empirical word-count range (bootstrapping text rows
would plant thousands of exact duplicates the real generator does not
have); embeddings are unit-normalized Gaussians with the measured
per-label centroid signal.  One parquet file, one row group, snappy —
the same physical layout as the shipped dirs (that layout is load-
bearing: it is what makes every scan single-task, see
OPTIMIZATION_r06.md cross-cutting fix #1).

NOT part of the driver contract and never read by bench.py unless
SPARK_GRAFT_SF_DIR points at its output.

Usage: python tools/make_sf_approx.py SF OUT_DIR   (e.g. 1.0 /root/sfgen/sf1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SRC_SF = 0.1

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"),
                   compression="snappy", row_group_size=1 << 31)
    print(f"  {name}: {table.num_rows} rows")


def _bootstrap(rng: np.random.Generator, name: str, n: int,
               key_cols: dict[str, int] | None = None,
               seq_col: str | None = None) -> pa.Table:
    """Resample n rows from the sf0.1 table; rewrite seq_col to 0..n-1
    and each key col to a uniform draw over its new range."""
    src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    idx = rng.integers(0, src.num_rows, n)
    cols = {}
    for col in src.column_names:
        arr = src.column(col).combine_chunks()
        cols[col] = arr.take(pa.array(idx))
    if seq_col:
        cols[seq_col] = pa.array(np.arange(n, dtype=np.int64))
    if key_cols:
        for col, hi in key_cols.items():
            dt = cols[col].type
            cols[col] = pa.array(rng.integers(0, hi, n), type=dt)
    return pa.table(cols)


def main() -> None:
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / SRC_SF
    rng = np.random.default_rng(20260822)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    n_user = int(15_000 * sf)

    # small dims are sf-invariant: copy verbatim
    for name in ("region", "nation"):
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        _write(out_dir, name, t)

    _write(out_dir, "customer",
           _bootstrap(rng, "customer", n_cust, seq_col="c_custkey"))
    _write(out_dir, "supplier",
           _bootstrap(rng, "supplier", n_supp, seq_col="s_suppkey"))
    _write(out_dir, "part",
           _bootstrap(rng, "part", n_part, seq_col="p_partkey"))
    _write(out_dir, "orders",
           _bootstrap(rng, "orders", n_ord, seq_col="o_orderkey",
                      key_cols={"o_custkey": n_cust}))
    _write(out_dir, "lineitem",
           _bootstrap(rng, "lineitem", n_li,
                      key_cols={"l_orderkey": n_ord, "l_partkey": n_part,
                                "l_suppkey": n_supp}))
    _write(out_dir, "events",
           _bootstrap(rng, "events", n_ev, seq_col="event_id",
                      key_cols={"user_id": n_user}))

    # documents: fresh word soup from the measured unigram distribution
    # (uniform over the 31-word vocab within sampling noise at sf0.1)
    wc = rng.integers(10, 101, n_doc)
    total = int(wc.sum())
    words = np.array(VOCAB)[rng.integers(0, len(VOCAB), total)]
    offs = np.concatenate(([0], np.cumsum(wc)))
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    _write(out_dir, "documents", docs)

    # embeddings: unit vectors with the measured weak label signal
    # (per-label centroid norm ~0.07 after normalization)
    dim = 64
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    cents = rng.standard_normal((10, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    v = rng.standard_normal((n_emb, dim)) + 0.58 * cents[labels]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v.astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    _write(out_dir, "embeddings", emb)

    open(os.path.join(out_dir, "_DONE"), "w").close()
    print(f"wrote approx sf{sf} to {out_dir}")


if __name__ == "__main__":
    main()
