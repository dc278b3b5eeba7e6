"""Streaming surface: incremental near-duplicate detection.

The reference is batch-with-resume (SURVEY §2.7) — its incremental unit
is one file (cache.py:122-126).  This module exposes the same
semantics over Structured Streaming: new file rows arrive on a stream,
each micro-batch is deduplicated BOTH against itself and against
everything seen before, and all state lives in the same checkpoint
tables the batch pipeline uses (signature cache + cumulative bands +
verified pairs) — so a streaming job and a batch job are
interchangeable views of one incremental computation.

Shape: ``readStream`` (file source) → ``foreachBatch``: inside each
batch we reuse the exact batch-stage functions (fingerprint,
signatures, banding, verify) — no separate streaming implementations to
drift out of sync.  State tables:

    <work>/stream/signatures/   all signatures seen (append-only)
    <work>/stream/bands/        all band rows seen (append-only)
    <work>/stream/pairs/        verified pairs (append-only)
    <work>/stream/bucket_stats/ per-(band, band_hash) size/rep deltas

New-batch candidates come from the INCREMENTAL band-bucket state: only
buckets touched by new files are processed, sized from the persisted
stats deltas (sum/min merge on read) — each arriving file is compared
against the history members of its own buckets, never all-pairs and
never a full-history rescan (see _incremental_candidates).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codedup.config import DedupConfig
from codedup.stages.banding import band_rows
from codedup.stages.candidates import _salted_pairs
from codedup.stages.exact import representatives
from codedup.stages.fingerprint import fingerprint
from codedup.stages.ingest import FILES_SCHEMA
from codedup.stages.signatures import compute_signatures
from codedup.stages.verify import verify_pairs


def windowed_event_counts(spark: SparkSession, source_dir: str,
                          checkpoint_dir: str,
                          window: str = "1 day",
                          watermark: str = "1 day"):
    """Event-time windowed rollup with a watermark over the events
    stream table (SURVEY §2.7's "if a streaming surface is added" path):
    readStream -> withWatermark -> window().groupBy -> counts.  Late
    rows beyond the watermark are dropped by the engine; state for
    closed windows is evicted.  Returns the started query writing to an
    in-memory sink named 'event_counts' (tests/demo; production would
    write a table)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("event_counts")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stateful_user_totals(spark: SparkSession, source_dir: str, checkpoint_dir: str,
                         max_files_per_trigger: int = 1):
    """Custom STATEFUL streaming operator via applyInPandasWithState
    (SURVEY §2.7's "custom stateful operators" path): cumulative
    per-user event count + value total, state carried across
    micro-batches by the engine's state store (not by side tables like
    IncrementalDedup — this is the API for state that must live inside
    the streaming engine: timeouts, watermark eviction, rescaling).

    Emits one updated row per user per batch to the in-memory sink
    'user_totals' (update mode: the LAST row per user is current)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(total, 2)],
        })

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory").queryName("user_totals")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


class IncrementalDedup:
    """foreachBatch processor with exactly-once state tables.

    foreachBatch is AT-LEAST-once: a crash between state writes and the
    checkpoint commit re-delivers the batch (ADVICE r1).  Two guards
    make replays no-ops:

      * each batch stages its outputs under ``<table>/batch_id=N/``
        with overwrite — a partial retry rewrites the same paths
        instead of appending duplicates;
      * a commit marker ``_committed/N`` is written LAST; a re-entered
        batch whose marker exists returns immediately;
      * a re-entered batch whose marker does NOT exist first deletes any
        ``batch_id=N`` staging dirs left by the crashed attempt — else
        the retry would read its own half-written output as history and
        anti-join the whole batch away (ADVICE r2 high: silent loss in
        the partial-commit window).

    ``compact()`` folds the accumulated per-batch directories into one
    snapshot per table so per-batch history reads stay bounded (state
    growth finding, VERDICT r1 #9).  With ``compact_every=k`` it runs
    automatically inside the commit path after every k-th committed
    batch (VERDICT r2 #8)."""

    def __init__(self, spark: SparkSession, work_dir: str, cfg: DedupConfig | None = None,
                 compact_every: int | None = 8):
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.compact_every = compact_every
        self.root = os.path.join(work_dir, "stream")
        self.sig_dir = os.path.join(self.root, "signatures")
        self.bands_dir = os.path.join(self.root, "bands")
        self.pairs_dir = os.path.join(self.root, "pairs")
        self.content_dir = os.path.join(self.root, "contents")
        self.stats_dir = os.path.join(self.root, "bucket_stats")
        self.marker_dir = os.path.join(self.root, "_committed")
        self._tables = (self.sig_dir, self.bands_dir, self.pairs_dir,
                        self.content_dir, self.stats_dir)

    # --- state access ---
    def _recover_compaction(self, path: str) -> None:
        """Repair a compact() interrupted by a crash (ADVICE r3 medium):
        compact renames the live table aside (``<t>._old``) before the
        snapshot takes its place, so the live data is ALWAYS present in
        exactly one of <t> / <t>._old.  If <t> is missing or empty while
        <t>._old exists, the crash hit between the rename-aside and the
        snapshot move — restore the original; if <t> is populated, the
        snapshot landed — the leftovers are garbage.  A leftover
        ``._compact`` tmp is always garbage (the snapshot is only ever
        MOVED out of it after a complete write)."""
        import shutil

        old, tmp = path + "._old", path + "._compact"
        if os.path.isdir(old):
            live = os.path.isdir(path) and any(
                not e.startswith((".", "_")) for e in os.listdir(path))
            if not live:
                if os.path.isdir(path):
                    shutil.rmtree(path)
                os.rename(old, path)
            else:
                shutil.rmtree(old)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)

    def _read_or_none(self, path: str) -> DataFrame | None:
        self._recover_compaction(path)
        if not os.path.isdir(path) or not any(
            not e.startswith((".", "_")) for e in os.listdir(path)
        ):
            return None
        df = self.spark.read.option("basePath", path).parquet(path)
        return df.drop("batch_id") if "batch_id" in df.columns else df

    def _stage_write(self, df: DataFrame, table_dir: str, batch_id: int) -> None:
        # Bound output files per batch: a per-batch write at full shuffle
        # parallelism leaves shuffle_partitions tiny files per table per
        # batch, and every later batch re-lists and re-opens ALL of them
        # — at 20 batches x 128 partitions x 4 tables the history read
        # becomes a small-files scan that grows the per-batch wall
        # superlinearly.  repartition (not coalesce: coalesce would cap
        # the upstream compute stage's parallelism) shuffles only this
        # batch's small output.
        n_files = max(self.cfg.shuffle_partitions // 16, 2)
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(table_dir, f"batch_id={batch_id}"))

    def _is_committed(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self.marker_dir, str(batch_id)))

    def _mark_committed(self, batch_id: int) -> None:
        os.makedirs(self.marker_dir, exist_ok=True)
        with open(os.path.join(self.marker_dir, str(batch_id)), "w") as f:
            f.write("ok")

    def _n_committed(self) -> int:
        if not os.path.isdir(self.marker_dir):
            return 0
        return sum(1 for e in os.listdir(self.marker_dir) if not e.startswith("."))

    def _clear_staged(self, batch_id: int) -> None:
        """Delete UNCOMMITTED batch_id=N staging dirs before reading any
        state.  process_batch only reaches here when the marker is
        absent, so a present staging dir is a crashed prior attempt of
        this same batch — leaving it would make the retry see its own
        rows as history, anti-join them away, and overwrite the staged
        dirs with empty data (permanent silent loss)."""
        import shutil

        for d in self._tables:
            staged = os.path.join(d, f"batch_id={batch_id}")
            if os.path.isdir(staged):
                shutil.rmtree(staged)

    def compact(self) -> dict:
        """Fold per-batch directories into one snapshot per table;
        returns per-table file counts before/after.  State contents are
        unchanged (tested).

        Crash-recoverable (ADVICE r3 medium — the old order deleted the
        live dir before the snapshot was in place, so a crash inside the
        window lost the table's entire state): the snapshot is fully
        written to ``<t>._compact`` first, THEN the live dir is renamed
        aside to ``<t>._old`` (one atomic rename), the snapshot moves in,
        and ``._old`` is deleted last.  Every crash point leaves either
        the original state or the complete snapshot recoverable;
        _recover_compaction (run before every state read) repairs it."""
        import shutil

        stats = {}
        for d in self._tables:
            df = self._read_or_none(d)   # also runs recovery for d
            if df is None:
                continue
            if d == self.stats_dir:
                # deltas fold with sum/min (associative), so the
                # snapshot can pre-merge to one row per bucket
                df = df.groupBy("band", "band_hash").agg(
                    F.sum("cnt").alias("cnt"), F.min("rep").alias("rep"))
            before = sum(len(fs) for _, _, fs in os.walk(d))
            tmp, old = d + "._compact", d + "._old"
            df.coalesce(max(self.cfg.shuffle_partitions // 4, 1)) \
                .write.mode("overwrite").parquet(tmp)
            os.rename(d, old)            # live state parked, atomically
            os.makedirs(d)
            # snapshot lives under batch_id=-1 so the layout stays
            # partition-discoverable next to future batch_id=N writes
            os.rename(tmp, os.path.join(d, "batch_id=-1"))
            shutil.rmtree(old)           # only after the snapshot is live
            after = sum(len(fs) for _, _, fs in os.walk(d))
            stats[os.path.basename(d)] = {"files_before": before, "files_after": after}
        return stats

    def signatures(self) -> DataFrame | None:
        return self._read_or_none(self.sig_dir)

    def pairs(self) -> DataFrame:
        df = self._read_or_none(self.pairs_dir)
        if df is None:
            return self.spark.createDataFrame(
                [], "a long, b long, jaccard double, n_inter long, n_union long,"
                    " hamming int, lcs_frac double, kind string"
            )
        return df

    def _bucket_stats(self) -> DataFrame | None:
        """Merged per-(band, band_hash) bucket stats: the per-batch
        DELTAS (cnt, rep) fold with sum/min on read — associative, so
        the generic compact() snapshot (plain concatenation) stays
        correct, and compact() additionally pre-merges this table.
        Bootstraps from the bands table when resuming a pre-stats state
        layout (one full scan, once)."""
        s = self._read_or_none(self.stats_dir)
        if s is not None:
            return s
        old_bands = self._read_or_none(self.bands_dir)
        if old_bands is None:
            return None
        boot = old_bands.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("cnt"), F.min("file_id").alias("rep"))
        # PERSIST the bootstrap as the batch_id=-1 snapshot: if it only
        # lived in this batch's memory, the next batch would see a
        # stats dir holding nothing but this batch's delta and
        # undercount every pre-stats bucket (wrong size policy, wrong
        # rep) — the bootstrap must enter the merge-on-read lineage.
        # Stage-then-rename (ADVICE r5): a direct write crashing midway
        # leaves a partial batch_id=-1 that a retry would accept as
        # done (undercounted stats silently entering the lineage); the
        # dot-prefixed tmp dir is invisible to parquet discovery and
        # the rename is atomic.
        import shutil

        tmp = os.path.join(self.stats_dir, f".tmp-boot-{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)
        boot.repartition(max(self.cfg.shuffle_partitions // 16, 2)) \
            .write.mode("overwrite").parquet(tmp)
        os.rename(tmp, os.path.join(self.stats_dir, "batch_id=-1"))
        return self._read_or_none(self.stats_dir)

    def _incremental_candidates(self, new_bands: DataFrame,
                                old_bands: DataFrame | None):
        """-> (candidate pairs touching new files, this batch's stats
        delta).  The incremental twin of stages.candidates.
        candidate_pairs (VERDICT r4 #2):

          * bucket SIZE and REP come from the persisted stats deltas
            merged with this batch's counts — no window over history;
          * only buckets touched by new files are processed at all
            (untouched buckets' pairs were earlier batches' output);
          * small buckets (merged size <= cap) fetch their old members
            via a broadcast semi-join keyed on the touched-bucket set
            and emit the complete new-touching pair set;
          * salted/auto medium buckets do the same through the salt
            spread (_salted_pairs — identical policy, complete
            coverage);
          * star-regime buckets (auto beyond cap*salt_buckets, or any
            hot bucket in star mode) NEVER fetch members: new members
            edge to the merged rep, and when a new file takes over as
            rep a single (new_rep, old_rep) bridge keeps the component
            connected — the boilerplate bucket every batch touches
            costs O(new members in it), not O(bucket).

        Per-batch shuffle volume is therefore ∝ this batch's bands +
        members of touched non-star buckets, independent of history
        size; history is only SCANNED (broadcast semi-join, no
        exchange).  At 10^12 scale the bands state would be bucketed by
        band_hash so even the scan prunes to touched buckets — same
        logical plan."""
        cfg = self.cfg
        cap = cfg.band_bucket_cap
        giant_at = cap * cfg.salt_buckets
        new_stats = (
            new_bands.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("cnt"), F.min("file_id").alias("rep"))
            .localCheckpoint(eager=True)
        )
        touched = new_stats.select("band", "band_hash")
        old_stats = self._bucket_stats()
        if old_stats is not None:
            old_touched = (
                old_stats.join(F.broadcast(touched), ["band", "band_hash"], "left_semi")
                .groupBy("band", "band_hash")
                .agg(F.sum("cnt").alias("cnt_old"), F.min("rep").alias("rep_old"))
            )
            tot = new_stats.join(old_touched, ["band", "band_hash"], "left")
        else:
            tot = new_stats.withColumn("cnt_old", F.lit(None).cast("long")) \
                           .withColumn("rep_old", F.lit(None).cast("long"))
        tot = (
            tot.select(
                "band", "band_hash",
                (F.col("cnt") + F.coalesce(F.col("cnt_old"), F.lit(0))).alias("bsz"),
                F.least(F.col("rep"), F.coalesce(F.col("rep_old"), F.col("rep")))
                .alias("rep"),
                "rep_old",
            )
            .filter(F.col("bsz") > 1)
            .localCheckpoint(eager=True)   # small: one row per touched bucket
        )
        if cfg.hot_bucket_mode == "star":
            star_cond = F.col("bsz") > cap
        elif cfg.hot_bucket_mode == "auto":
            star_cond = F.col("bsz") > giant_at
        else:  # salted: complete coverage everywhere, no star regime
            star_cond = F.lit(False)

        # member-needing buckets: everything below the star regime
        mkeys = tot.filter(~star_cond).select("band", "band_hash", "bsz")
        members = new_bands.join(
            F.broadcast(mkeys.select("band", "band_hash")),
            ["band", "band_hash"], "left_semi")
        if old_bands is not None:
            members = members.unionByName(
                old_bands.select(*new_bands.columns).join(
                    F.broadcast(mkeys.select("band", "band_hash")),
                    ["band", "band_hash"], "left_semi"))
        sized = members.join(F.broadcast(mkeys), ["band", "band_hash"])
        small = sized.filter(F.col("bsz") <= cap).select("band", "band_hash", "file_id")
        pairs = (
            small.alias("x").join(small.alias("y"), ["band", "band_hash"])
            .filter(F.col("x.file_id") < F.col("y.file_id"))
            .select(F.col("x.file_id").alias("a"), F.col("y.file_id").alias("b"))
        )
        hot_members = sized.filter(F.col("bsz") > cap)
        pairs = pairs.unionByName(_salted_pairs(hot_members, cfg))

        starb = tot.filter(star_cond)
        star_new = (
            new_bands.join(F.broadcast(starb.select("band", "band_hash", "rep")),
                           ["band", "band_hash"])
            .filter(F.col("file_id") != F.col("rep"))
            .select(F.col("rep").alias("a"), F.col("file_id").alias("b"))
        )
        bridge = (
            starb.filter(F.col("rep_old").isNotNull()
                         & (F.col("rep") < F.col("rep_old")))
            .select(F.col("rep").alias("a"), F.col("rep_old").alias("b"))
        )
        pairs = pairs.unionByName(star_new).unionByName(bridge) \
            .dropDuplicates(["a", "b"])

        # keep only pairs touching a NEW file (old x old inside touched
        # small buckets were earlier batches' candidates)
        new_ids = new_bands.select("file_id").distinct()
        na = new_ids.select(F.col("file_id").alias("a")).withColumn("_na", F.lit(1))
        nb = new_ids.select(F.col("file_id").alias("b")).withColumn("_nb", F.lit(1))
        cands = (
            pairs.join(F.broadcast(na), "a", "left")
            .join(F.broadcast(nb), "b", "left")
            .filter(F.col("_na").isNotNull() | F.col("_nb").isNotNull())
            .drop("_na", "_nb")
        )
        return cands, new_stats

    # --- the batch function ---
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._is_committed(batch_id):
            return  # at-least-once replay of a committed batch: no-op
        self._clear_staged(batch_id)  # purge any crashed partial attempt
        # CODEDUP_STREAM_TIMING=1: per-section walls to stderr, so the
        # streaming-vs-batch overhead is ATTRIBUTABLE (VERDICT r4 #2)
        import sys as _sys
        import time as _time
        _timing = os.environ.get("CODEDUP_STREAM_TIMING") == "1"
        _t = {"_last": _time.time()}

        def _mark(name: str) -> None:
            if _timing:
                now = _time.time()
                _t[name] = round(now - _t["_last"], 2)
                _t["_last"] = now

        cfg = self.cfg
        fp = fingerprint(batch).localCheckpoint(eager=True)
        reps = representatives(fp)

        seen = self.signatures()
        old_contents = self._read_or_none(self.content_dir)
        # cross-batch exact-dup collapse (P3 across time): a content whose
        # sha256 is already in history is not re-signed — its duplicate
        # relationship is recoverable from fingerprints by sha, exactly
        # like within-batch exact groups
        new_reps = reps.select("file_id", "sha256", "content")
        if old_contents is not None:
            new_reps = new_reps.join(
                old_contents.select("sha256"), "sha256", "left_anti"
            )
        new_reps = new_reps.select("file_id", "content", "sha256")
        if seen is not None:
            new_reps = new_reps.join(seen.select("file_id"), "file_id", "left_anti")
        _mark("fingerprint_dedup")
        new_sigs = compute_signatures(
            new_reps.select("file_id", "content"), cfg
        ).localCheckpoint(eager=True)
        new_bands = band_rows(new_sigs, cfg).localCheckpoint(eager=True)
        _mark("signatures_bands")

        old_bands = self._read_or_none(self.bands_dir)
        # Candidates: INCREMENTAL band-bucket state (VERDICT r4 #2) —
        # per-(band, band_hash) size/rep stats persist as per-batch
        # deltas; only buckets TOUCHED by new files are processed, with
        # the same small/salted/star policy as the batch path.  Replaces
        # the r3 form (candidate_pairs over new ∪ FULL history, filtered
        # to new-touching), whose per-batch window re-shuffled every
        # history band row.
        cands, new_stats = self._incremental_candidates(new_bands, old_bands)
        cands = cands.localCheckpoint(eager=True)   # feeds id-prune + verify
        _mark("candidates")

        # Verify joins must see content/signatures ∝ CANDIDATES, not the
        # full history: semi-join both state tables down to candidate-
        # involved ids first (the candidate id set is small — broadcast),
        # else every batch shuffles the whole accumulated corpus twice
        # and per-batch wall grows superlinearly (measured: 16.8 s ->
        # 142.7 s over 6 batches at the 355k tier before this prune).
        cand_ids = (
            cands.select(F.col("a").alias("file_id"))
            .unionByName(cands.select(F.col("b").alias("file_id")))
            .distinct().localCheckpoint(eager=True)
        )
        contents = new_reps.select("file_id", "content")
        if old_contents is not None:
            contents = contents.unionByName(old_contents.select("file_id", "content"))
        all_sigs = new_sigs if seen is None else seen.unionByName(new_sigs)
        contents = contents.join(F.broadcast(cand_ids), "file_id", "left_semi")
        all_sigs = all_sigs.join(F.broadcast(cand_ids), "file_id", "left_semi")
        verified = verify_pairs(cands, contents, all_sigs, cfg)
        _mark("verify_plan")

        # commit state: per-batch staging dirs (overwrite => replay-safe)
        # then the marker LAST — a crash anywhere earlier leaves a
        # partial batch that the retry simply rewrites
        self._stage_write(verified, self.pairs_dir, batch_id)
        _mark("verify_and_pairs_write")   # verify computes inside this write
        self._stage_write(new_sigs, self.sig_dir, batch_id)
        self._stage_write(new_bands, self.bands_dir, batch_id)
        self._stage_write(new_stats, self.stats_dir, batch_id)
        self._stage_write(new_reps.select("file_id", "content", "sha256"),
                          self.content_dir, batch_id)
        _mark("state_writes")
        self._mark_committed(batch_id)
        if self.compact_every and self._n_committed() % self.compact_every == 0:
            self.compact()
        _mark("compact")
        if _timing:
            parts = {k: v for k, v in _t.items() if k != "_last"}
            print(f"# timing batch {batch_id}: {parts}", file=_sys.stderr,
                  flush=True)

    def start(self, source_dir: str, checkpoint_dir: str | None = None,
              trigger_once: bool = True):
        """File-source stream over a directory of parquet drops."""
        stream = (
            self.spark.readStream.schema(FILES_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(source_dir)
        )
        writer = (
            stream.writeStream
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir or os.path.join(self.root, "_chk"))
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
