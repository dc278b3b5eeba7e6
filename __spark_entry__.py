"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

One query deliberately has NO oracle entry (the driver records its
weaker rows-only check for it): ``feedback_model_predictions`` —
Spark-ML logistic regression, an iterative optimizer DuckDB cannot
replicate; it is pinned by tests/test_feedback.py instead.
``ann_ivf_topk`` is oracle-exact since r3: the KMeans training half
runs offline (tools/make_ivf_centroids.py pins the centroids as a
golden that tests/test_ann_ivf.py proves reproducible), and the search
half — assignment + nprobe + cosine rank over the pinned centroid
literals — is deterministic SQL on both engines, with recall >= 0.8 vs
brute force still gated in tests/test_ann_ivf.py.

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
