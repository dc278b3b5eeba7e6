"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

Every query has a value-exact oracle entry (r3).  The two Spark-ML
queries reach this through offline training: the iterative optimizer
(KMeans for ``ann_ivf_topk``, logistic regression for
``feedback_model_predictions``) runs in tools/make_ivf_centroids.py /
tools/make_lr_model.py and its artifact is pinned as a committed
golden; the query is the deterministic SQL-expressible inference half
over the pinned literals.  Tests assert the training reproduces each
golden and (for LR) that pinned scoring equals the live Spark-ML
model's predictions; IVF recall >= 0.8 vs brute force stays gated in
tests/test_ann_ivf.py.

Implementations live in the ``codedup`` package (see SURVEY.md §2 for
the operator mapping and codedup/queries.py for per-query docs).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the MinHash(128)/LSH(b=16,r=8) near-duplicate pipeline
    (signatures -> banding -> skew-aware candidates -> exact verify)
    over the sf0.001 documents table."""
    from codedup.queries import q_dedup_minhash_lsh

    return q_dedup_minhash_lsh(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from codedup.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from codedup.queries import ORACLES

    return dict(ORACLES)
