"""Recall/precision vs constructed truth at bench scale.

Usage: python tools/recall_at_scale.py <corpus_dir> [work_dir] [cores]
           [--margin M] [--lcs-cap N]

--margin / --lcs-cap override DedupConfig.minhash_prefilter_margin and
.lcs_max_chars — the two verify-stage budget knobs (VERDICT r3 #1:
verify is ~70% of large-tier wall; tools/sweep_verify.py drives this
script across a margin x cap grid and reports verify wall vs recall).

corpus_dir must contain files.parquet + truth_clusters.parquet (written
by codedup.fixtures.write_corpus).  Runs the pipeline (resuming from
work_dir if given), then compares co-membership pair sets ENTIRELY in
Spark (the pair sets are tens of millions of rows at 500k-base scale —
never collected):

    truth co-membership: truth_clusters self-join on truth_cluster_id
    pred  co-membership: members self-join on cluster_id
    recall    = |pred ∩ truth| / |truth|
    precision = |pred ∩ truth| / |pred restricted to truth keys|

Prints one JSON line with stage walls from the run's manifests.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def co_pairs(df, key_col: str, cid_col: str):
    """Co-membership pairs with keys HASHED to longs (xxhash64): at the
    888k tier the pair sets are ~79M rows — 16-byte long pairs stay
    memory-resident where 50-byte string keys would not."""
    from pyspark.sql import functions as F

    h = df.select(F.xxhash64(F.col(key_col)).alias("k"), F.col(cid_col).alias("c"))
    a = h.select(F.col("k").alias("ka"), "c")
    b = h.select(F.col("k").alias("kb"), "c")
    return a.join(b, "c").filter(F.col("ka") < F.col("kb")).select("ka", "kb")


def main() -> int:
    argv = list(sys.argv[1:])
    kw = {}
    if "--margin" in argv:
        i = argv.index("--margin")
        kw["minhash_prefilter_margin"] = float(argv[i + 1])
        del argv[i:i + 2]
    if "--lcs-cap" in argv:
        i = argv.index("--lcs-cap")
        kw["lcs_max_chars"] = int(argv[i + 1])
        del argv[i:i + 2]
    if "--no-lcs" in argv:
        kw["lcs_signal"] = False
        argv.remove("--no-lcs")
    corpus = argv[0]
    work = argv[1] if len(argv) > 1 else None
    cores = argv[2] if len(argv) > 2 else "32"

    from codedup import pipeline
    from codedup.config import DedupConfig
    from codedup.session import build_session

    cfg = DedupConfig(shuffle_partitions=128, **kw)
    spark = build_session(f"local[{cores}]", app_name="recall-at-scale",
                          shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    n = spark.read.parquet(f"{corpus}/files.parquet").count()

    t0 = time.time()
    res = pipeline.run(spark, [f"{corpus}/files.parquet"], cfg,
                       work_dir=work, run_id="recall", resume=bool(work))
    wall = time.time() - t0

    truth = spark.read.parquet(f"{corpus}/truth_clusters.parquet")
    truth_cc = co_pairs(truth, "key", "truth_cluster_id").localCheckpoint(eager=True)
    # restrict members to truth keys BEFORE pairing (precision is
    # defined over truth keys; this also shrinks giant clusters first)
    members_t = res.members.join(truth.select("key"), "key", "left_semi")
    pred = co_pairs(members_t, "key", "cluster_id").localCheckpoint(eager=True)

    n_truth = truth_cc.count()
    n_pred = pred.count()
    n_inter = pred.join(truth_cc, ["ka", "kb"], "left_semi").count()

    stages = {}
    if work:
        for m in glob.glob(os.path.join(work, "runs", "recall", "*.manifest.json")):
            with open(m) as f:
                d = json.load(f)
            stages[d["stage"]] = round(d["wall_ms"] / 1000, 1)

    print(json.dumps({
        "files": n,
        "margin": cfg.minhash_prefilter_margin,
        "lcs_cap": cfg.lcs_max_chars,
        "lcs_signal": cfg.lcs_signal,
        "wall_s": round(wall, 1),
        "files_per_sec": round(n / wall, 1),
        "truth_pairs": n_truth,
        "pred_pairs": n_pred,
        "recall": round(n_inter / n_truth, 6) if n_truth else 1.0,
        "precision": round(n_inter / n_pred, 6) if n_pred else 1.0,
        "stages": stages,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
