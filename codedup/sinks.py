"""Partitioned output sinks — the organize half of S12.

The reference physically arranges files into category folders
(classify_server.py:382-451 'organize by category').  The engine's
analog arranges the OUTPUT TABLES by their serving keys, so downstream
consumers get partition PRUNING instead of directory listings:

    actions partitioned by action   -> a consumer applying only
        'dedup' rows scans one directory, not the table
    members partitioned by lang     -> per-language review tooling
        reads its slice only

Partition columns are low-cardinality by construction (3 actions, a
handful of langs), so this creates O(categories) directories — never
the small-files explosion a high-cardinality partitionBy would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_actions(actions: DataFrame, out_dir: str) -> None:
    """actions table partitioned by action (keep/dedup/review)."""
    actions.write.mode("overwrite").partitionBy("action").parquet(out_dir)


def write_members(members: DataFrame, out_dir: str) -> None:
    """cluster members partitioned by lang."""
    members.write.mode("overwrite").partitionBy("lang").parquet(out_dir)


def read_partition(spark: SparkSession, out_dir: str, col: str, value: str) -> DataFrame:
    """Partition-pruned read: the filter must show up as a
    PartitionFilters entry in the scan, not a post-scan Filter
    (asserted in tests/test_sinks.py)."""
    from pyspark.sql import functions as F

    return spark.read.parquet(out_dir).filter(F.col(col) == value)
