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

    Conflict semantics: names are grouped into FAMILIES — stem with any
    trailing _<digits> stripped, plus suffix — because stem_N probing
    makes 'a.py' and 'a_1.py' share one namespace (a per-stem plan
    produced cross-stem collisions; caught by the randomized property
    test).  Within a family: (1) the first mover (iteration order:
    cluster asc, rank asc, file_id) holding each distinct original
    basename KEEPS it when no existing file does — original-name
    priority, a deliberate deviation from the reference's strictly
    sequential probing, which can steal a later file's own name;
    (2) everyone else takes the family's free candidate sequence
    base.sfx, base_1.sfx, base_2.sfx, ... skipping existing and claimed
    names, in iteration order.  Deterministic, collision-free, linear
    candidates (never quadratic).

    Scale bound: assignment windows are per family, so one
    pathologically hot basename (think __init__.py at 10^12 files)
    serializes its movers into one sort task — fine to ~10^7 movers per
    name; beyond that, salt the window and offset each salt group by
    the exclusive prefix sum of group counts."""
    spark = actions.sparkSession
    movers = (
        actions.filter(F.col("action").isin(*MOVE_ACTIONS))
        # basename of the path portion of key (repo/path@commit)
        .withColumn("src_name",
                    F.element_at(F.split(F.regexp_extract("key", r"^(.*)@[^@]*$", 1), "/"), -1))
    )
    movers = _with_name_parts(movers, "src_name").withColumn(
        "fam", F.regexp_replace("stem", "_[0-9]+$", ""))

    exist = (existing if existing is not None
             else spark.createDataFrame([], "name string"))
    exist_names = exist.select(F.col("name"))
    exist_parts = _with_name_parts(exist_names, "name").withColumn(
        "fam", F.regexp_replace("stem", "_[0-9]+$", ""))
    exist_cnt = exist_parts.groupBy("fam", "suffix").agg(
        F.count(F.lit(1)).alias("e_cnt"))

    # (1) original-name claims: first mover per distinct src_name, name
    # not already present at the destination
    claim_w = Window.partitionBy("src_name").orderBy("cluster_id", "rank", "file_id")
    with_claim = movers.withColumn("_claim_rn", F.row_number().over(claim_w)) \
        .join(exist_names.withColumnRenamed("name", "src_name")
              .withColumn("_taken", F.lit(True)), "src_name", "left")
    claimants = with_claim.filter((F.col("_claim_rn") == 1) & F.col("_taken").isNull())
    rest = with_claim.join(claimants.select("file_id"), "file_id", "left_anti")

    claimed_names = claimants.select(F.col("src_name").alias("blocked"))
    blocked = claimed_names.unionByName(
        exist_names.select(F.col("name").alias("blocked"))).distinct()

    # (2) family candidate sequence minus blocked names -> free slots
    m_cnt = movers.groupBy("fam", "suffix").agg(F.count(F.lit(1)).alias("m_cnt"))
    bounds = m_cnt.join(exist_cnt, ["fam", "suffix"], "left").fillna(0, ["e_cnt"])
    cands = (
        bounds.withColumn(
            "i", F.explode(F.sequence(F.lit(0), F.col("m_cnt") * 2 + F.col("e_cnt"))))
        .withColumn(
            "cand_name",
            F.when(F.col("i") == 0, F.concat("fam", "suffix"))
            .otherwise(F.concat("fam", F.lit("_"), F.col("i").cast("string"), "suffix")),
        )
    )
    free = cands.join(blocked.withColumnRenamed("blocked", "cand_name"),
                      "cand_name", "left_anti")
    slot_w = Window.partitionBy("fam", "suffix").orderBy("i")
    free_slots = free.withColumn("slot", F.row_number().over(slot_w) - 1) \
        .select("fam", "suffix", "slot", "cand_name")

    ord_w = Window.partitionBy("fam", "suffix").orderBy("cluster_id", "rank", "file_id")
    ordered = rest.withColumn("ordinal", F.row_number().over(ord_w) - 1)

    assigned = (
        ordered.join(free_slots,
                     (ordered["fam"] == free_slots["fam"])
                     & (ordered["suffix"] == free_slots["suffix"])
                     & (ordered["ordinal"] == free_slots["slot"]))
        .select("file_id", "key", "cluster_id", "rank", "action", "src_name",
                F.col("cand_name").alias("dest_name"))
    )
    kept = claimants.select("file_id", "key", "cluster_id", "rank", "action",
                            "src_name", F.col("src_name").alias("dest_name"))
    return (
        assigned.unionByName(kept)
        .withColumn("dest_path",
                    F.concat(F.lit(dest_root.rstrip("/") + "/"), "dest_name"))
        .drop("dest_name")
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
