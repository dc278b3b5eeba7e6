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


def inverted_index_jaccard_join(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact all-pairs Jaccard join for SMALL-VOCABULARY corpora, as a
    broadcast inverted-index scan.

    When the distinct-element universe is small relative to corpus size
    (every element is frequent), prefix filtering cannot prune — the
    inverted-list cost sum(df(g)^2) is intrinsic.  This variant makes
    that scan vectorized instead of relational: the whole inverted index
    (a few MB: postings as dense int32 doc indices + offsets) is
    broadcast to every task; each task computes, per probe document, the
    intersection counts against ALL documents with one
    numpy ``bincount`` over the concatenated postings of its elements,
    then applies the exact integer threshold.

    Output: (a, b, c, na, nb) for pairs with jaccard >= threshold, a<b
    by doc_id — bit-identical to the naive all-pairs SQL (all integer
    arithmetic).

    Scale contract: broadcast side = whole corpus index => this is the
    EXACT baseline for corpora/blocks that fit an executor (~10^6 docs);
    the 10^12-file path is MinHash-LSH (probabilistic) or this operator
    applied per LSH/length block."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    min_ppm = int(round(threshold * 1_000_000))
    pdf = sh.toPandas()
    doc_ids = np.sort(pdf["doc_id"].unique())
    n_docs = doc_ids.size
    didx = np.searchsorted(doc_ids, pdf["doc_id"].to_numpy())
    codes, _ = pd.factorize(pdf["g"])

    # postings: for each element code, the dense doc indices containing it
    order = np.argsort(codes, kind="stable")
    post_docs = didx[order].astype(np.int32)
    post_off = np.searchsorted(codes[order], np.arange(codes.max() + 2))
    # per-doc element codes
    order_d = np.argsort(didx, kind="stable")
    doc_codes = codes[order_d].astype(np.int32)
    doc_off = np.searchsorted(didx[order_d], np.arange(n_docs + 1))
    sizes = (doc_off[1:] - doc_off[:-1]).astype(np.int64)

    def gen(it):
        for batch in it:
            out_a, out_b, out_c, out_na, out_nb = [], [], [], [], []
            for did in batch["doc_id"].to_numpy():
                i = int(np.searchsorted(doc_ids, did))
                cs = doc_codes[doc_off[i]:doc_off[i + 1]]
                if cs.size == 0:
                    continue
                concat = np.concatenate([post_docs[post_off[c]:post_off[c + 1]] for c in cs])
                cnt = np.bincount(concat, minlength=n_docs).astype(np.int64)
                union = sizes + sizes[i] - cnt
                with np.errstate(divide="ignore", invalid="ignore"):
                    ppm = np.where(union > 0, (cnt * 1_000_000) // np.maximum(union, 1), 1_000_000)
                mask = (ppm >= min_ppm) & (doc_ids > did)
                js = np.nonzero(mask)[0]
                out_a.extend([did] * js.size)
                out_b.extend(doc_ids[js].tolist())
                out_c.extend(cnt[js].tolist())
                out_na.extend([int(sizes[i])] * js.size)
                out_nb.extend(sizes[js].tolist())
            yield pd.DataFrame({"a": out_a, "b": out_b, "c": out_c,
                                "na": out_na, "nb": out_nb}).astype("int64")

    schema = T.StructType([T.StructField(c, T.LongType()) for c in ("a", "b", "c", "na", "nb")])
    probes = sh.sparkSession.createDataFrame(
        pd.DataFrame({"doc_id": doc_ids}), schema="doc_id long"
    ).repartition(max(sh.sparkSession.sparkContext.defaultParallelism, 8))
    return probes.mapInPandas(gen, schema=schema)


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
