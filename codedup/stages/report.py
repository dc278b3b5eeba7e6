"""Stage 8/9 — exemplars, savings, report.

Reference analogs:
  W1 keep-best election (cli.py:29-30, 253-256; classifier.py:453-456)
      -> row_number window, rank 1 = exemplar (keep), rest = duplicates
  W2 composite score (classifier.py:764-786)
      -> configurable column expression; default = size desc (the scan
         pipeline's keep-largest rule) with deterministic file_id
         tie-break
  A2/A3/A4 savings + counters (dedup.py:32-74)
      -> hash aggregates per cluster + one global aggregate
  JSON report shape mirrors cli.py:285-321 / report1.json:4-17.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_members(clusters: DataFrame, fp: DataFrame, score: Column | None = None) -> DataFrame:
    """clusters(file_id, cluster_id) ⋈ fingerprints -> + rank (1 = keep).

    Default score = size (keep-largest, cli.py:29-30); ties broken by
    file_id so ranking is rerun-stable."""
    members = clusters.join(
        fp.select("file_id", "key", "repo", "path", "lang", "size", "sha256"), "file_id"
    )
    order = [F.desc("size"), F.asc("file_id")] if score is None else [F.desc(score), F.asc("file_id")]
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return members.withColumn("rank", F.row_number().over(w))


def cluster_stats(ranked: DataFrame) -> DataFrame:
    """Per-cluster aggregates (group total/savings, dedup.py:32-44).

    A cluster whose members all share one sha256 is an exact group
    (match_type='exact', dedup.py:30); otherwise it contains true
    near-duplicates."""
    return ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size").alias("total_size"),
        (F.sum("size") - F.max("size")).alias("potential_savings"),
        F.countDistinct("sha256").alias("n_distinct_contents"),
    )


def action_plan(ranked: DataFrame) -> DataFrame:
    """S10/S12 analog: the reference MOVES duplicate files to a review
    folder (cli.py:240-282) / organizes by category (classify_server.py:
    382-451).  The engine never mutates storage; it emits a declarative
    action table a downstream job can apply idempotently:

        keep    rank 1 (the exemplar)
        dedup   rank > 1, byte-identical to the exemplar's content
        review  rank > 1, near-duplicate (human-or-policy decision)
    """
    keep = ranked.filter(F.col("rank") == 1).select(
        "cluster_id", F.col("sha256").alias("_keep_sha")
    )
    return (
        ranked.join(keep, "cluster_id")
        .withColumn(
            "action",
            F.when(F.col("rank") == 1, F.lit("keep"))
            .when(F.col("sha256") == F.col("_keep_sha"), F.lit("dedup"))
            .otherwise(F.lit("review")),
        )
        .withColumn(
            "reason",
            F.when(F.col("rank") == 1, F.lit("largest member (keep-best election)"))
            .when(F.col("sha256") == F.col("_keep_sha"), F.lit("byte-identical to kept file"))
            .otherwise(F.lit("near-duplicate of kept file")),
        )
        .select("file_id", "key", "cluster_id", "rank", "action", "reason")
    )


def summary(fp: DataFrame, ranked: DataFrame) -> dict:
    """Driver-side small dict mirroring the reference report summary
    (report1.json:4-17).  Two aggregate jobs total."""
    totals = fp.agg(
        F.count(F.lit(1)).alias("total_files"), F.sum("size").alias("total_size")
    ).first()
    agg = (
        cluster_stats(ranked)
        .agg(
            F.count(F.lit(1)).alias("groups"),
            F.sum("n_files").alias("files_in_groups"),
            F.sum(F.when(F.col("n_distinct_contents") == 1, 1).otherwise(0)).alias("exact_groups"),
            F.sum(F.when(F.col("n_distinct_contents") > 1, 1).otherwise(0)).alias("near_groups"),
            F.sum("potential_savings").alias("potential_savings"),
        )
        .first()
    )
    return {
        "summary": {
            "total_files": int(totals["total_files"] or 0),
            "total_size_bytes": int(totals["total_size"] or 0),
            "duplicate_groups": int(agg["groups"] or 0),
            "files_in_groups": int(agg["files_in_groups"] or 0),
            "exact_only_groups": int(agg["exact_groups"] or 0),
            "groups_with_near_duplicates": int(agg["near_groups"] or 0),
            "potential_savings_bytes": int(agg["potential_savings"] or 0),
        }
    }
