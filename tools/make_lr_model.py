"""Train the preference LR once and pin its scoring function as a
committed golden (codedup/golden/feedback_lr.json) — the same
offline-training pattern as the IVF quantizer (make_ivf_centroids.py):
the iterative optimizer runs here, and the catalog query becomes a
deterministic relational scoring pass both engines can compute, so
`feedback_model_predictions` graduates from the rows-only check to the
value-exact oracle.

The pinned artifact folds the StandardScaler into the weights:
    z = w·(x-μ)/σ + b  =  x·c + b0,   c_i = w_i/σ_i,
    b0 = b - Σ_i w_i μ_i / σ_i
so the query is a single dot product + sigmoid + 0.7/0.3 thresholds.

Usage: python tools/make_lr_model.py [sf_dir]
tests/test_feedback.py asserts retraining reproduces this golden.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

OUT = os.path.join(os.path.dirname(__file__), "..", "codedup", "golden",
                   "feedback_lr.json")


def train_folded(spark, sf_dir: str) -> dict:
    """Train on the synthesized feedback rows (vec_id % 5 != 0,
    label < 5 -> keep) and return the folded scoring parameters."""
    from pyspark.sql import functions as F

    from codedup.feedback import PreferenceModel

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    fb = emb.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").cast("string").alias("key"),
        F.when(F.col("label") < 5, "keep").otherwise("trash").alias("decision"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    model = PreferenceModel()
    stats = model.train(fb)
    assert stats["success"], stats
    w = model.model.coefficients.toArray()
    b = float(model.model.intercept)
    mu = model.scaler.mean.toArray()
    sigma = model.scaler.std.toArray()
    c = (w / sigma).tolist()
    b0 = b - float((w * mu / sigma).sum())
    return {
        "sf_dir": sf_dir,
        "train_stats": stats,
        "coef": [round(x, 9) for x in c],
        "bias": round(b0, 9),
    }


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    golden = train_folded(spark, sf_dir)
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {len(golden['coef'])}-dim folded LR -> {OUT}")
    print(f"train stats: {golden['train_stats']}")


if __name__ == "__main__":
    main()
