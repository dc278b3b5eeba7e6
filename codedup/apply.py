"""Action-plan APPLY job — the consuming half of S10/S12.

The reference physically moves every non-kept group member into a
destination directory, probing ``stem_N.suffix`` names until one is
free, with a dry-run mode (cli.py:240-282 ``move_duplicates``).  The
engine's batch pipeline only EMITS the declarative action table
(stages/report.py:action_plan); this module turns it into moves:

  plan_moves     deterministic (file -> destination name) assignment,
                 fully relational: candidate names are enumerated per
                 (stem, suffix), anti-joined against existing
                 destination names, and matched to movers by slot —
                 no driver-side probing loop, no collect.
  apply_moves    executes a plan against a manifest directory:
                 dry_run previews; a real run records the manifest;
                 re-running is a NO-OP (anti-join against the
                 manifest), mirroring idempotent resume semantics.
  post_apply_files   the files table as it would look after the moves
                 (moved rows re-pathed under dest_root) — the engine
                 mutates state tables, never a filesystem.

Name-conflict semantics mirror the reference: iteration order is
(cluster, rank asc = size desc, file_id); the first mover of a basename
keeps the plain name if no existing file holds it; later movers (and
collisions with existing names) take ``stem_1``, ``stem_2``, ... in
order, skipping taken names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MOVE_ACTIONS = ("dedup", "review")


def _with_name_parts(df: DataFrame, name_col: str) -> DataFrame:
    """Split a file name into (stem, suffix): suffix = from the LAST dot
    (inclusive), '' when there is no dot — Path.stem/.suffix semantics."""
    has_dot = F.col(name_col).rlike("^.+\\..+$")
    return df.withColumn(
        "stem",
        F.when(has_dot, F.regexp_extract(F.col(name_col), r"^(.*)\.[^.]+$", 1))
        .otherwise(F.col(name_col)),
    ).withColumn(
        "suffix",
        F.when(has_dot, F.regexp_extract(F.col(name_col), r"^.*(\.[^.]+)$", 1))
        .otherwise(F.lit("")),
    )


def plan_moves(actions: DataFrame, dest_root: str,
               existing: DataFrame | None = None) -> DataFrame:
    """actions(file_id, key, cluster_id, rank, action) with action in
    MOVE_ACTIONS -> moves(file_id, key, cluster_id, rank, action,
    src_name, dest_path).

    ``existing``: optional (name string) table of files already present
    in the destination; they keep their names, movers probe around
    them.

    Scale bound: ordinal assignment is a window per (stem, suffix), so
    one pathologically hot basename (think __init__.py at 10^12 files)
    serializes its movers into one sort task — fine to ~10^7 movers per
    name; beyond that, salt the window and offset each salt group by
    the exclusive prefix sum of group counts (same order, parallel
    sort).  Candidate probing is already linear: m+e+1 names per
    (stem, suffix), never quadratic."""
    spark = actions.sparkSession
    movers = (
        actions.filter(F.col("action").isin(*MOVE_ACTIONS))
        # basename of the path portion of key (repo/path@commit)
        .withColumn("src_name",
                    F.element_at(F.split(F.regexp_extract("key", r"^(.*)@[^@]*$", 1), "/"), -1))
    )
    movers = _with_name_parts(movers, "src_name")

    exist = (existing if existing is not None
             else spark.createDataFrame([], "name string"))
    exist_parts = _with_name_parts(exist, "name")
    exist_cnt = exist_parts.groupBy("stem", "suffix").agg(
        F.count(F.lit(1)).alias("e_cnt"))

    m_cnt = movers.groupBy("stem", "suffix").agg(F.count(F.lit(1)).alias("m_cnt"))
    bounds = m_cnt.join(exist_cnt, ["stem", "suffix"], "left").fillna(0, ["e_cnt"])

    # candidate names 0..m+e per (stem, suffix): index 0 is the plain
    # name, i>0 is stem_i.suffix; removing the <= e existing collisions
    # leaves >= m free slots
    cands = (
        bounds.withColumn("i", F.explode(F.sequence(F.lit(0), F.col("m_cnt") + F.col("e_cnt"))))
        .withColumn(
            "cand_name",
            F.when(F.col("i") == 0, F.concat("stem", "suffix"))
            .otherwise(F.concat("stem", F.lit("_"), F.col("i").cast("string"), "suffix")),
        )
    )
    free = cands.join(exist.select(F.col("name").alias("cand_name")),
                      "cand_name", "left_anti")
    slot_w = Window.partitionBy("stem", "suffix").orderBy("i")
    free_slots = free.withColumn("slot", F.row_number().over(slot_w) - 1) \
        .select("stem", "suffix", "slot", "cand_name")

    # mover ordinal = reference iteration order: clusters ascending,
    # within a cluster rank ascending (size desc), file_id tiebreak
    ord_w = Window.partitionBy("stem", "suffix").orderBy("cluster_id", "rank", "file_id")
    ordered = movers.withColumn("ordinal", F.row_number().over(ord_w) - 1)

    return (
        ordered.join(free_slots,
                     (ordered["stem"] == free_slots["stem"])
                     & (ordered["suffix"] == free_slots["suffix"])
                     & (ordered["ordinal"] == free_slots["slot"]))
        .select("file_id", "key", "cluster_id", "rank", "action", "src_name",
                F.concat(F.lit(dest_root.rstrip("/") + "/"), "cand_name").alias("dest_path"))
    )


def plan_deletes(actions: DataFrame) -> DataFrame:
    """S11 delete sink, planning half: rows safe to DELETE are the
    byte-identical duplicates only (action='dedup' — same sha256 as the
    kept exemplar); near-duplicates stay 'review' and are never planned
    for deletion.  Execute with apply_moves (same manifest/idempotence
    mechanics; use a separate manifest_dir) and reflect with
    post_delete_files."""
    return actions.filter(F.col("action") == "dedup").select(
        "file_id", "key", "cluster_id", "rank", "action"
    )


def post_delete_files(fp: DataFrame, manifest_dir: str, spark: SparkSession) -> DataFrame:
    """files table AFTER applied deletes: manifest rows anti-joined out
    (the state-table analog of unlink)."""
    manifest_path = os.path.join(manifest_dir, "applied.parquet")
    if not os.path.isdir(manifest_path):
        return fp
    applied = spark.read.parquet(manifest_path).select("file_id")
    return fp.join(applied, "file_id", "left_anti")


def apply_moves(spark: SparkSession, moves: DataFrame, manifest_dir: str,
                dry_run: bool = False) -> dict:
    """Execute a move plan against a manifest directory.

    dry_run: report what WOULD move; nothing written.  A real run
    appends the manifest; files already recorded there are skipped, so
    re-applying the same plan is a no-op (resume-safe, like the
    reference's cache-backed incremental scan)."""
    manifest_path = os.path.join(manifest_dir, "applied.parquet")
    if os.path.isdir(manifest_path):
        prior = spark.read.parquet(manifest_path)
        todo = moves.join(prior.select("file_id"), "file_id", "left_anti")
    else:
        prior = None
        todo = moves
    todo = todo.localCheckpoint(eager=True)  # stable across the count + write
    n = todo.count()
    if dry_run:
        return {"dry_run": True, "would_move": n, "moved": 0}
    if n:
        todo.write.mode("append").parquet(manifest_path)
    return {"dry_run": False, "would_move": n, "moved": n}


def post_apply_files(fp: DataFrame, manifest_dir: str, spark: SparkSession) -> DataFrame:
    """files-with-ids table as it stands AFTER applied moves: moved rows
    get their path rewritten to the destination (state-table analog of
    the reference's shutil.move)."""
    manifest_path = os.path.join(manifest_dir, "applied.parquet")
    if not os.path.isdir(manifest_path):
        return fp
    applied = spark.read.parquet(manifest_path).select("file_id", "dest_path")
    return (
        fp.join(applied, "file_id", "left")
        .withColumn("path", F.coalesce("dest_path", "path"))
        .drop("dest_path")
    )
