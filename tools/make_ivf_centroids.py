"""Train the IVF coarse quantizer once and pin its centroids as a
committed golden (codedup/golden/ivf_centroids.json).

This is the production IVF shape (e.g. faiss): the quantizer is trained
OFFLINE on a sample, and searches ship the centroid matrix — they never
retrain.  Pinning the KMeans(seed=42, k=16) centroids makes the
`ann_ivf_topk` catalog query fully deterministic and SQL-expressible,
so the assignment + nprobe search + cosine rank gets a value-exact
DuckDB oracle (VERDICT r2 #1); tests/test_ann_ivf.py asserts the
training run still reproduces this golden exactly.

Usage: python tools/make_ivf_centroids.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

OUT = os.path.join(os.path.dirname(__file__), "..", "codedup", "golden",
                   "ivf_centroids.json")


def main() -> None:
    from pyspark.sql import SparkSession

    from codedup.ann import IVF_N_CELLS, IVF_SEED, build_ivf

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    _, centroids = build_ivf(emb, n_cells=IVF_N_CELLS, seed=IVF_SEED)
    # round to 6 decimals: the literal shared verbatim by the Spark
    # query and the DuckDB oracle (same convention as _ann_planes)
    rounded = [[round(float(x), 6) for x in c] for c in centroids]
    with open(OUT, "w") as f:
        json.dump({"sf_dir": sf_dir, "n_cells": IVF_N_CELLS, "seed": IVF_SEED,
                   "centroids": rounded}, f, indent=1)
    print(f"wrote {len(rounded)} centroids x {len(rounded[0])} dims -> {OUT}")


if __name__ == "__main__":
    main()
