"""Stable identity columns.

The reference keys everything by filesystem path (cache.py:47-57 PRIMARY
KEY path).  At 10^12-file scale the key must be a fixed-width integer
that is deterministic across runs AND across cluster sizes, so:

    file_id = xxhash64(repo, path, commit)     (JVM built-in, no UDF)
    key     = repo || '/' || path || '@' || commit   (human-readable join key)

``monotonically_increasing_id`` is partition-dependent and therefore
forbidden (SURVEY §4.2 item 7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY_COLS = ("repo", "path", "commit")


def file_id_col() -> Column:
    return F.xxhash64(F.col("repo"), F.col("path"), F.col("commit")).alias("file_id")


def key_col() -> Column:
    return F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.col("commit")).alias("key")


def with_ids(files: DataFrame) -> DataFrame:
    return files.withColumn("file_id", file_id_col()).withColumn("key", key_col())
