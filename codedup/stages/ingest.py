"""Stage 0 — ingest: source scan + key hygiene.

Reference analogs: directory scan S1 (scanner.py:19-44), multi-source
union + overlap dedup S2 (scanner.py:47-74), extension predicate S3
(scanner.py:7-16).  Here the source is already a table; "recursive
scan" is a table scan, the seen-set becomes ``dropDuplicates`` on the
key, and the extension filter becomes a pushed-down ``lang`` predicate
(partition pruning when the table is partitioned by lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILES_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("content", T.StringType(), False),
])


def read_files(spark: SparkSession, *paths: str, langs: list[str] | None = None) -> DataFrame:
    """Scan one or more source tables, union, dedup overlapping keys.

    The lang filter is applied before anything else so Catalyst pushes
    it into the parquet scan (check: PushedFilters in .explain)."""
    dfs = [spark.read.schema(FILES_SCHEMA).parquet(p) for p in paths]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d)
    if langs:
        df = df.filter(F.col("lang").isin(list(langs)))
    if len(dfs) > 1:
        df = df.dropDuplicates(["repo", "path", "commit"])
    return df


def split_invalid(files: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Errors side-channel (the reference appends IO errors to a list,
    dedup.py:121-122; SURVEY §1.2 maps this to an errors side-output
    table — rows are never silently dropped).

    Returns (valid, errors) where errors carries (repo, path, commit,
    stage, message) for rows with null/empty key columns or null
    content."""
    bad_key = (
        F.col("repo").isNull() | F.col("path").isNull() | F.col("commit").isNull()
        | (F.col("repo") == "") | (F.col("path") == "")
    )
    bad_content = F.col("content").isNull()
    errors = (
        files.filter(bad_key | bad_content)
        .select(
            "repo", "path", "commit",
            F.lit("ingest").alias("stage"),
            F.when(bad_content, F.lit("null content"))
            .otherwise(F.lit("null/empty key column")).alias("message"),
        )
    )
    return files.filter(~(bad_key | bad_content)), errors
