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


def split_id_collisions(fp: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route 64-bit file_id collisions to the errors side-channel.

    At the design target of 10^12 files, birthday math on a 64-bit id
    expects ~27k colliding pairs; a silent collision merges two
    unrelated files into one identity — corrupting clusters and,
    worse, letting the APPLY job act on a non-duplicate (ADVICE r1).
    The guard is one aggregation: ids held by >1 distinct key are
    excluded from the pipeline and surfaced as errors (never silent).

    Returns (clean, collided)."""
    coll = (
        fp.groupBy("file_id")
        .agg(F.countDistinct(*KEY_COLS).alias("_nk"))
        .filter(F.col("_nk") > 1)
        .select("file_id")
    )
    # collision set is ~0 rows in practice: broadcast both anti/semi joins
    return (
        fp.join(F.broadcast(coll), "file_id", "left_anti"),
        fp.join(F.broadcast(coll), "file_id", "left_semi"),
    )
