"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

Two queries deliberately have NO oracle entry (the driver records its
weaker rows-only check for them): ``feedback_model_predictions``
(Spark-ML logistic regression) and ``ann_ivf_topk`` (Spark-ML KMeans)
— iterative optimizers DuckDB cannot replicate; both are pinned by
dedicated tests instead (tests/test_feedback.py, tests/test_ann_ivf.py
— the IVF one proves recall >= 0.8 vs the exact brute-force query).

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
