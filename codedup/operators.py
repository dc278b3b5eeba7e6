"""Reusable relational operators that Spark lacks natively.

``exact_jaccard_join`` — exact set-similarity self-join with
prefix + length filtering (the PPJoin family of pruning rules; public
algorithm: Xiao et al., "Efficient Similarity Joins for Near Duplicate
Detection", WWW'08).  Unlike MinHash-LSH this is EXACT — no
probabilistic recall — while avoiding the all-pairs blowup of a naive
shingle equi-join, whose cost is sum over shingles g of df(g)^2 and is
dominated by the hottest (most common) shingles.

Pruning rules (both lossless for Jaccard >= t):
  * prefix filter: order every set by global rarity (doc-frequency asc,
    then shingle value); a qualifying pair must collide inside the
    first  n - ceil(t*n) + 1  elements of each set.  Proof: if the
    intersection lived entirely in the suffix, |A∩B| <= |A|-prefix =
    ceil(t|A|)-1 < t|A| <= t|A∪B| <= |A∩B| — contradiction.  The
    hottest shingles sort LAST, so they fall out of prefixes — exactly
    the skew-killer the naive join lacks.
  * length filter: J(A,B) >= t implies t*|A| <= |B| (and symmetrically),
    so candidate pairs with size ratio beyond 1/t are dropped before
    verification.

Verification then computes true intersection counts ONLY for surviving
candidate pairs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_jaccard_join(sh: DataFrame, threshold: float) -> DataFrame:
    """sh(doc_id, g): distinct set elements per doc (g = any orderable
    element, typically a shingle hash).  Returns (a, b, c, na, nb) for
    every pair with c/(na+nb-c) >= threshold, a < b; caller derives the
    jaccard representation it wants."""
    t = threshold

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df_g = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df"))

    ranked = (
        sh.join(df_g, "g")
        .join(sizes, "doc_id")
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "g")),
        )
        # prefix_len = n - ceil(t*n) + 1; the 1e-9 slack keeps float
        # representation error in t*n from overshooting the ceil (which
        # would shorten the prefix and silently LOSE qualifying pairs)
        .withColumn("prefix_len", F.col("n") - F.ceil(F.col("n") * F.lit(t) - F.lit(1e-9)) + 1)
    )
    prefix = ranked.filter(F.col("pos") <= F.col("prefix_len")).select("doc_id", "g", "n")

    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "g")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        # length filter: sizes within ratio 1/t (epsilon-relaxed: pruning
        # must only ever be lossless)
        .filter(F.col("y.n") * F.lit(t - 1e-9) <= F.col("x.n"))
        .filter(F.col("x.n") * F.lit(t - 1e-9) <= F.col("y.n"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )

    # verify: true intersection counts, only for candidates
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("a"), "g"), "a")
        .join(sh.select(F.col("doc_id").alias("b"), "g"), ["b", "g"], "inner")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = (
        inter
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        # epsilon-relaxed: callers apply their exact (integer) final
        # threshold; this filter only sheds clearly-failing candidates
        .filter(F.col("c") >= (F.col("na") + F.col("nb") - F.col("c")) * F.lit(t - 1e-9))
    )
    return out


def blocked_jaccard_join(sh: DataFrame, threshold: float, n_blocks: int = 16,
                         metric: str = "jaccard") -> DataFrame:
    """Exact all-pairs Jaccard join for SMALL-VOCABULARY corpora, as a
    block-partitioned inverted-index scan — fully distributed, nothing
    ever collected to the driver.

    When the distinct-element universe is small relative to corpus size
    (every element is frequent), prefix filtering cannot prune — the
    inverted-list cost sum(df(g)^2) is intrinsic.  This operator splits
    that cost across block pairs instead: documents are packed into
    ``n_blocks`` dense set-blocks (ONE groupBy shuffle), the
    NB*(NB+1)/2 unordered block pairs crossJoin, and each task
    intersects one block pair with a sparse postings expansion over the
    pair-local vocabulary — exact integer threshold math, bit-identical
    to the naive all-pairs SQL.

    Output: (a, b, c, na, nb) for pairs with jaccard >= threshold, a<b
    by doc_id.  Every unordered doc pair lives in exactly one unordered
    block pair, so no dedup is needed.

    Scale contract: per-task memory is O(block), so n_blocks is chosen
    to make blocks executor-sized (~10^5-10^6 docs); total work is the
    intrinsic sum(df(g)^2) regardless of n_blocks.  The 10^12-file path
    is MinHash-LSH (probabilistic); this is the EXACT quadratic
    baseline, distributed."""
    import pandas as pd

    def pack_part(it):
        import numpy as np

        # one exchange, not two: repartition(n_blocks, _blk) already
        # co-locates every row of a block in one partition, so the
        # partition-level groupby here replaces groupBy.applyInPandas
        # (which would add a second hash exchange of the same rows)
        parts = [pdf for pdf in it]
        if not parts:
            return
        for blk, pdf in pd.concat(parts).groupby("_blk", sort=False):
            pdf = pdf.sort_values(["doc_id", "g"])
            docs = pdf["doc_id"].to_numpy()
            uniq, start = np.unique(docs, return_index=True)
            offsets = np.append(start, docs.size).astype(np.int64)
            yield _pack_row(int(blk), uniq, offsets,
                            pdf["g"].to_numpy().astype(np.int64))

    blocks = (
        sh.withColumn("_blk", F.pmod(F.col("doc_id"), F.lit(n_blocks)))
        .repartition(n_blocks, "_blk")
        .mapInPandas(pack_part, schema=_PACK_SCHEMA())
    )
    return _sweep_block_pairs(blocks, threshold, n_blocks, metric)


def blocked_jaccard_join_text(docs: DataFrame, id_col: str, text_col: str,
                              k: int, threshold: float,
                              n_blocks: int = 16,
                              metric: str = "jaccard") -> DataFrame:
    """blocked_jaccard_join specialized to char-k-gram sets of a text
    column: shingling happens INSIDE the pack UDF (numpy rolling hash
    per document, kernels.shingle_hashes), so only the raw documents are
    shuffled once — no exploded (doc, gram) rows ever exist as a
    DataFrame.  Empty text packs one sentinel gram, mirroring the SQL
    substr('', i, k) = '' singleton set."""
    import pandas as pd

    def pack_part(it):
        import numpy as np

        from codedup import kernels as K

        # one exchange, not two (see blocked_jaccard_join.pack_part)
        parts = [pdf for pdf in it]
        if not parts:
            return
        for blk, pdf in pd.concat(parts).groupby("_blk", sort=False):
            pdf = pdf.sort_values(id_col)
            offsets = [0]
            grams = []
            for text in pdf[text_col]:
                h = np.unique(K.shingle_hashes(text, k, normalize_ws=False))
                if h.size == 0:
                    h = np.zeros(1, dtype=np.uint64)  # '' gram sentinel
                grams.append(h.view(np.int64))
                offsets.append(offsets[-1] + h.size)
            yield _pack_row(int(blk),
                            pdf[id_col].to_numpy(),
                            np.asarray(offsets, dtype=np.int64),
                            np.concatenate(grams))

    blocks = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col))
        .withColumn("_blk", F.pmod(F.col("doc_id"), F.lit(n_blocks)))
        .repartition(n_blocks, "_blk")
        .mapInPandas(pack_part, schema=_PACK_SCHEMA())
    )
    return _sweep_block_pairs(blocks, threshold, n_blocks, metric)


def _pack_row(blk: int, doc_ids, offsets, grams):
    """One packed-block row.  Besides the raw postings the pack
    precomputes, ONCE PER BLOCK, everything the sweep would otherwise
    rebuild once per block PAIR (a block participates in NB+1 pairs):

      vocab   — sorted distinct grams of the block (int64)
      inv     — posting -> block-vocab id, doc-major (int32)

    The gram-major inverted index (bygram) and per-gram counts (gcnt)
    are NOT shipped: both are derivable from inv in ~10 ms per pair
    (one bincount + one stable argsort), while shipping them doubled
    the sweep's shuffle volume — each block row rides the exchange to
    NB+1 pair tasks (guide §2.3, shuffle fewer bytes).
    """
    import numpy as np
    import pandas as pd

    vocab, inv = np.unique(grams, return_inverse=True)
    # narrowest lossless dtypes (guide §2.3 — shuffle fewer bytes: the
    # packed postings are most of the sweep's shuffle volume); the
    # sweep re-derives the dtype from vocab/doc counts, so no flag
    # column is needed
    idt = np.int16 if vocab.size < (1 << 15) else np.int32
    inv = inv.astype(idt)
    return pd.DataFrame({
        "blk": [blk],
        "doc_ids": [np.asarray(doc_ids, dtype=np.int64).tobytes()],
        "offsets": [np.asarray(offsets, dtype=np.int64).tobytes()],
        "vocab": [vocab.tobytes()],
        "inv": [inv.tobytes()],
    })


def _PACK_SCHEMA():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("blk", T.LongType()),
        T.StructField("doc_ids", T.BinaryType()),
        T.StructField("offsets", T.BinaryType()),
        T.StructField("vocab", T.BinaryType()),
        T.StructField("inv", T.BinaryType()),
    ])


def _sweep_block_pairs(blocks: DataFrame, threshold: float, n_blocks: int,
                       metric: str = "jaccard") -> DataFrame:
    """Shared sweep over packed set-blocks: unordered block pairs
    crossJoin; each task intersects one pair with a sparse
    inverted-index postings expansion over the pair-local vocabulary
    (cost = the intrinsic sum_g df_x(g) * df_y(g), exact int64 counts).

    metric="jaccard":      threshold on c / (na + nb - c)
    metric="containment":  threshold on c / min(na, nb) — max-containment,
        the near-SUBSET detector (a small file pasted inside a big one
        has high containment but low Jaccard); same candidates, same
        exact integer math, different denominator."""
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    min_ppm = int(round(threshold * 1_000_000))
    spark = blocks.sparkSession
    # both crossJoin sides read this; without an eager checkpoint the
    # lazy plan re-runs the shingle/pack UDF once per side
    blocks = blocks.localCheckpoint(eager=True)
    x = blocks.toDF("xblk", "xdocs", "xoff", "xv", "xinv")
    y = blocks.toDF("yblk", "ydocs", "yoff", "yv", "yinv")
    # one block pair per task: the sweep is CPU-dense and pairs are few,
    # so per-pair tasks give the scheduler the finest stealing grain
    # (4-5 pairs lumped per task left a 20-30% straggler tail; a
    # shuffle-free cartesian was tried and loses — the join plans as a
    # nested loop whose task count is the block partitioning, leaving
    # one task to grind 16 pairs serially)
    n_pairs = n_blocks * (n_blocks + 1) // 2
    pairs = (
        x.crossJoin(y)
        .filter(F.col("xblk") <= F.col("yblk"))
        .repartition(max(spark.sparkContext.defaultParallelism, n_pairs))
    )

    X_CHUNK = 1024    # x docs per count matrix: X_CHUNK * n_y int64
    # per-gram expansion-vs-gemm breakeven: a gemm column costs
    # ~n_x*n_y MACs at ~17 effective GFLOPS (incl. matrix build), a
    # gather entry ~5 ns, so only grams whose df product exceeds ~1e5
    # pay their way as dense columns (measured on the sf1.0 corpus:
    # H drops to the few-hundred boilerplate grams, everything else
    # rides the cache-resident per-doc bincount)
    HOT_MACS = 1 << 17

    def gen(it):
        import os as _os
        import sys as _sys
        import time as _time

        dbg = _os.environ.get("CODEDUP_SWEEP_DEBUG")
        for pdf in it:
            for row in pdf.itertuples(index=False):
                _t0 = _time.time()
                xdocs = np.frombuffer(row.xdocs, dtype=np.int64)
                xoff = np.frombuffer(row.xoff, dtype=np.int64)
                vx = np.frombuffer(row.xv, dtype=np.int64)
                ivx = np.frombuffer(
                    row.xinv,
                    dtype=np.int16 if vx.size < (1 << 15) else np.int32)
                ydocs = np.frombuffer(row.ydocs, dtype=np.int64)
                yoff = np.frombuffer(row.yoff, dtype=np.int64)
                vy = np.frombuffer(row.yv, dtype=np.int64)
                ivy = np.frombuffer(
                    row.yinv,
                    dtype=np.int16 if vy.size < (1 << 15) else np.int32)
                same = row.xblk == row.yblk
                n_x, n_y = xdocs.size, ydocs.size
                x_sizes = np.diff(xoff)
                y_sizes = np.diff(yoff)
                # derived once per pair rather than shipped (see
                # _pack_row): per-gram counts on both sides, and the
                # y-side gram-major inverted index
                gcx = np.bincount(ivx, minlength=vx.size).astype(np.int32)
                gcy = np.bincount(ivy, minlength=vy.size).astype(np.int32)
                ddt = np.int16 if n_y < (1 << 15) else np.int32
                y_row = np.repeat(np.arange(n_y, dtype=ddt), y_sizes)
                bygy = y_row[np.argsort(ivy, kind="stable")]

                # Intersection counts, HYBRID by per-gram cost (guide
                # §1.2 — fix the algorithm; §2.5 — skew needs a split,
                # one regime never fits):
                #   * COLD grams (the vocabulary tail): inverted-index
                #     gather — per x doc, concatenate the y-postings of
                #     its cold grams and bincount them into that doc's
                #     count row.  Cost is the intrinsic
                #     sum_g df_x(g)*df_y(g); the scatter target is one
                #     n_y row (cache-resident), not an n_x*n_y matrix.
                #   * HOT grams (boilerplate shared by a large doc
                #     fraction, where df_x*df_y explodes): dense 0/1
                #     gemm over JUST the hot columns — n_x * V_hot *
                #     n_y MACs with V_hot tiny.
                # Split per gram at df_x(g)*df_y(g) > HOT_MACS (the
                # measured expansion-entry vs gemm-column breakeven).
                # Both halves produce exact integer counts (float32
                # 0/1 sums are exact below 2^24 columns).
                vocab = np.union1d(vx, vy)      # both inputs sorted+unique
                V = vocab.size
                mapx = np.searchsorted(vocab, vx)
                mapy = np.searchsorted(vocab, vy)
                cxp = np.zeros(V, dtype=np.int64)
                cxp[mapx] = gcx
                cyp = np.zeros(V, dtype=np.int64)
                cyp[mapy] = gcy
                hot = (cxp * cyp) > HOT_MACS
                H = int(np.count_nonzero(hot))

                # block-x-domain tables for the cold per-doc gather:
                # for every x-block gram, where its y postings live and
                # how many there are (0 when absent on y or hot)
                pos = np.searchsorted(vy, vx)
                posc = np.minimum(pos, vy.size - 1)
                on_y = vy[posc] == vx
                hot_xb = hot[mapx]
                # int32 index arithmetic throughout the gather: posting
                # counts and offsets fit easily, and the idx temporaries
                # are the gather's main memory traffic
                reps_xb = np.where(on_y & ~hot_xb, gcy[posc], 0).astype(np.int32)
                yso = np.zeros(vy.size, dtype=np.int32)
                np.cumsum(gcy[:-1], out=yso[1:])
                ystart_xb = yso[posc]

                # dense 0/1 matrix of HOT gram membership per y doc
                if H:
                    dt = np.float32 if H < (1 << 24) else np.float64
                    hotcol = np.cumsum(hot) - 1      # pair gram -> hot col
                    y_row_doc = np.repeat(
                        np.arange(n_y, dtype=np.int32), y_sizes)
                    hot_yb = hot[mapy]
                    colmap_yb = np.where(hot_yb, hotcol[mapy], 0)
                    hm_y = hot_yb[ivy]
                    ymat = np.zeros((n_y, H), dtype=dt)
                    ymat[y_row_doc[hm_y], colmap_yb[ivy[hm_y]]] = 1.0
                    colmap_xb = np.where(hot_xb, hotcol[mapx], 0)
                    x_row_doc = np.repeat(
                        np.arange(n_x, dtype=np.int32), x_sizes)
                    # reused across chunks: the ONLY chunk-sized buffers.
                    # The old int64 count matrix + chunk-level ppm/denom
                    # temporaries streamed ~1 GB of freshly mmapped pages
                    # per block pair; under 32 concurrent tasks that page-
                    # fault + DRAM traffic tripled per-pair wall (measured
                    # 1.4 s idle -> 3.2 s mean contended).  Everything
                    # below chunk level is a 25 KB per-doc row in cache.
                    xmat = np.zeros((min(X_CHUNK, n_x), H), dtype=dt)
                    gout = np.empty((min(X_CHUNK, n_x), n_y), dtype=dt)

                # exact integer threshold algebra, per doc row (floor-div
                # >= T  <=>  c*1e6 >= T*denom for denom >= 1):
                #   jaccard:      c*1e6 >= T*(na+nb-c)
                #             <=> c*(1e6+T) >= T*(na+nb)
                #   containment:  c*1e6 >= T*min(na, nb)
                mp_nb = min_ppm * y_sizes            # int64, once per pair
                if metric == "containment":
                    lhs_mul = 1_000_000
                else:
                    lhs_mul = 1_000_000 + min_ppm
                out_a = []
                out_b = []
                out_c = []
                out_na = []
                out_nb = []
                for lo in range(0, n_x, X_CHUNK):
                    hi = min(lo + X_CHUNK, n_x)

                    # --- hot half: gemm over the hot columns only ---
                    if H:
                        rlo, rhi = int(xoff[lo]), int(xoff[hi])
                        ivx_sl = ivx[rlo:rhi]
                        hm_x = hot_xb[ivx_sl]
                        xmat[:hi - lo].fill(0)
                        xmat[(x_row_doc[rlo:rhi] - lo)[hm_x],
                             colmap_xb[ivx_sl[hm_x]]] = 1.0
                        np.matmul(xmat[:hi - lo], ymat.T, out=gout[:hi - lo])

                    # --- cold half + threshold, one cache-resident row
                    # per x doc ---
                    for d in range(lo, hi):
                        gs = ivx[xoff[d]:xoff[d + 1]]
                        reps = reps_xb[gs]
                        m = reps > 0
                        if m.any():
                            reps = reps[m]
                            tot = int(reps.sum(dtype=np.int64))
                            # fused single-repeat index build: delta[i] =
                            # (y-slice start of gram i) - (running start of
                            # its segment in idx), so idx = arange + repeat
                            delta = ystart_xb[gs[m]].copy()
                            delta[1:] -= np.cumsum(reps[:-1], dtype=np.int32)
                            idx = (np.arange(tot, dtype=np.int32)
                                   + np.repeat(delta, reps))
                            crow = np.bincount(bygy[idx], minlength=n_y)
                            if H:
                                # float 0/1 sums are exact below 2^24 cols
                                crow += gout[d - lo].astype(np.int64)
                        elif H:
                            crow = gout[d - lo].astype(np.int64)
                        else:
                            continue
                        na_d = int(x_sizes[d])
                        if metric == "containment":
                            rhs = np.minimum(mp_nb, min_ppm * na_d)
                        else:
                            rhs = mp_nb + min_ppm * na_d
                        keep = crow * lhs_mul >= rhs
                        if same:
                            # docs are id-sorted: self + lower ids form a
                            # prefix of the y row
                            cut = int(np.searchsorted(ydocs, xdocs[d],
                                                      side="right"))
                            keep[:cut] = False
                        bi = np.nonzero(keep)[0]
                        if bi.size == 0:
                            continue
                        xa = int(xdocs[d])
                        yb = ydocs[bi]
                        # (na, nb) follow the (a, b) id order, not block order
                        flip = xa > yb
                        nb_v = y_sizes[bi]
                        out_a.append(np.minimum(xa, yb))
                        out_b.append(np.maximum(xa, yb))
                        out_c.append(crow[bi])
                        out_na.append(np.where(flip, nb_v, na_d))
                        out_nb.append(np.where(flip, na_d, nb_v))
                if out_a:
                    yield pd.DataFrame({
                        "a": np.concatenate(out_a),
                        "b": np.concatenate(out_b),
                        "c": np.concatenate(out_c),
                        "na": np.concatenate(out_na),
                        "nb": np.concatenate(out_nb),
                    }).astype("int64")
                if dbg:
                    print(f"SWEEP pair ({row.xblk},{row.yblk}) "
                          f"{_time.time() - _t0:.2f}s", file=_sys.stderr)

    schema = T.StructType([T.StructField(c, T.LongType()) for c in ("a", "b", "c", "na", "nb")])
    return pairs.mapInPandas(gen, schema=schema)


def shingle_rows(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, text) -> distinct (doc_id, g) char-k-gram hash rows, pure
    codegen (xxhash64 inside the array transform, then explode)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({text_col})-{k - 1}, 1)),"
                f" i -> xxhash64(substring({text_col}, i, {k})))"
            )
        ).alias("g"),
    ).distinct()
