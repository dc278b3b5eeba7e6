"""Head-to-head: this engine's MinHash-LSH dedup vs pyspark.ml's
built-in MinHashLSH.approxSimilarityJoin on the same documents table.

Why the engine does NOT use MLlib's implementation (SURVEY §2.8 note):
approxSimilarityJoin exposes no banding control (numHashTables is pure
OR-amplification, one row per table), no skew handling, and no
checkpointable intermediates.  This script quantifies the cost/recall
difference.  Usage: python tools/compare_mllib.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.sql import functions as F

    from codedup.queries import NGRAM_K, q_dedup_minhash_lsh
    from codedup.session import build_session

    spark = build_session("local[32]", app_name="mllib-compare", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()

    # --- ours ---
    t0 = time.time()
    ours = q_dedup_minhash_lsh(spark, sf_dir)
    ours_pairs = {(r["a"], r["b"]) for r in ours.collect()}
    t_ours = time.time() - t0

    # --- MLlib: shingle set -> binary HashingTF vector -> MinHashLSH ---
    t0 = time.time()
    shingled = docs.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, greatest(length(text)-{NGRAM_K - 1}, 1)),"
            f" i -> substring(text, i, {NGRAM_K}))"
        ).alias("grams"),
    )
    tf = HashingTF(inputCol="grams", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    feats = tf.transform(shingled).select("doc_id", "features")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=16, seed=42)
    model = lsh.fit(feats)
    joined = (
        model.approxSimilarityJoin(feats, feats, 0.2, distCol="dist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
        )
    )
    mllib_pairs = {(r["a"], r["b"]) for r in joined.collect()}
    t_mllib = time.time() - t0

    inter = ours_pairs & mllib_pairs
    print(f"docs={n}")
    print(f"ours : {t_ours:6.1f}s  pairs={len(ours_pairs)}")
    print(f"mllib: {t_mllib:6.1f}s  pairs={len(mllib_pairs)} (numHashTables=16, thr jaccard>=0.8)")
    print(f"agreement: {len(inter)} shared; ours-only {len(ours_pairs - mllib_pairs)}, "
          f"mllib-only {len(mllib_pairs - ours_pairs)}")
    print(f"speedup: {t_mllib / t_ours:.2f}x")


if __name__ == "__main__":
    main()
