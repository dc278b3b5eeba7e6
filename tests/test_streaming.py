"""Structured-Streaming incremental dedup: drops of new files must be
deduplicated against the full history, and the cumulative pair set must
equal the batch pipeline's verified pairs over the union of all drops.
"""

import os

import pytest

from codedup.config import DedupConfig
from codedup.fixtures import generate_corpus
from codedup.streaming import IncrementalDedup


@pytest.fixture(scope="module")
def drops(tmp_path_factory):
    """The tiny corpus split into 3 ordered parquet drops."""
    d = tmp_path_factory.mktemp("stream_src")
    files = generate_corpus("tiny")["files"]
    thirds = [files.iloc[i::3].reset_index(drop=True) for i in range(3)]
    paths = []
    for i, part in enumerate(thirds):
        p = str(d / f"drop_{i}.parquet")
        part.to_parquet(p, index=False)
        paths.append(p)
    return {"dir": str(d), "paths": paths, "files": files}


def test_incremental_equals_batch(spark, drops, cfg, tmp_path):
    inc = IncrementalDedup(spark, str(tmp_path / "stream_work"), cfg)
    # drive the stream over all drops (availableNow drains the source)
    q = inc.start(drops["dir"], checkpoint_dir=str(tmp_path / "chk"))
    q.awaitTermination(300)

    got = inc.pairs().toPandas()
    assert not got.duplicated(["a", "b"]).any(), "a pair verified twice across batches"

    # batch pipeline over the union of all drops
    from codedup import pipeline

    union_path = str(tmp_path / "all.parquet")
    drops["files"].to_parquet(union_path, index=False)
    res = pipeline.run(spark, [union_path], cfg, work_dir=str(tmp_path / "bwork"),
                       run_id="b", resume=False)
    want = res.verified.toPandas()

    # streaming elects first-seen representatives, batch elects min-file_id
    # — compare pairs at content (sha256) level
    fpdf = res.fingerprints.select("file_id", "sha256").toPandas()
    id2sha = dict(zip(fpdf.file_id, fpdf.sha256))
    got_keys = {frozenset((id2sha[a], id2sha[b])) for a, b in zip(got.a, got.b)}
    want_keys = {frozenset((id2sha[a], id2sha[b])) for a, b in zip(want.a, want.b)}
    assert got_keys == want_keys, (
        f"stream-only: {len(got_keys - want_keys)}, batch-only: {len(want_keys - got_keys)}"
    )


def test_windowed_event_counts_match_batch(spark, tmp_path):
    """Watermarked streaming window agg over events == batch groupBy
    over the same data (all rows within watermark in this replay)."""
    import shutil

    from pyspark.sql import functions as F

    from codedup.streaming import windowed_event_counts

    src = str(tmp_path / "events_src")
    import os
    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src + "/events.parquet")

    q = windowed_event_counts(spark, src, str(tmp_path / "chk"))
    q.awaitTermination(300)
    got = (
        spark.table("event_counts").toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type", "n_events", "sum_value")
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    assert got.equals(batch)
    assert len(got) > 10


def test_streaming_state_tables_exist(spark, drops, cfg, tmp_path_factory):
    # state dirs created by the previous test's module-scoped stream work
    # are not shared (tmp_path differs); run a tiny standalone check
    work = tmp_path_factory.mktemp("sw")
    inc = IncrementalDedup(spark, str(work), cfg)
    q = inc.start(drops["dir"], checkpoint_dir=str(work / "chk"))
    q.awaitTermination(300)
    for sub in ("signatures", "bands", "pairs", "contents"):
        assert os.path.isdir(os.path.join(str(work), "stream", sub)), sub
    sigs = inc.signatures()
    assert sigs is not None
    # one signature per distinct content, never recomputed
    n_distinct = drops["files"].content.nunique()
    assert sigs.select("file_id").distinct().count() == n_distinct


def test_replay_of_committed_batch_is_noop(spark, drops, cfg, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-committed
    batch_id must not duplicate state (ADVICE r1)."""
    inc = IncrementalDedup(spark, str(tmp_path / "w"), cfg)
    b0 = spark.read.parquet(drops["paths"][0])
    inc.process_batch(b0, 0)
    pairs1 = inc.pairs().toPandas().sort_values(["a", "b"], ignore_index=True)
    sigs1 = inc.signatures().count()
    inc.process_batch(b0, 0)  # replay
    pairs2 = inc.pairs().toPandas().sort_values(["a", "b"], ignore_index=True)
    assert pairs1.equals(pairs2)
    assert inc.signatures().count() == sigs1


def test_replay_of_uncommitted_batch_recovers(spark, drops, cfg, tmp_path):
    """ADVICE r2 high: a crash AFTER staging but BEFORE the commit
    marker must not lose the batch on retry.  Simulated by running the
    batch fully, deleting the marker (= crash in the partial-commit
    window), and re-delivering: without the staged-dir purge the retry
    reads its own staged rows as history, anti-joins the batch away and
    overwrites the staging dirs with empty data."""
    inc = IncrementalDedup(spark, str(tmp_path / "w"), cfg)
    b0 = spark.read.parquet(drops["paths"][0])
    inc.process_batch(b0, 0)
    pairs1 = inc.pairs().toPandas().sort_values(["a", "b"], ignore_index=True)
    sigs1 = inc.signatures().toPandas().sort_values("file_id", ignore_index=True)
    assert len(sigs1) > 0

    os.remove(os.path.join(inc.marker_dir, "0"))  # crash window
    inc.process_batch(b0, 0)  # at-least-once retry

    sigs2 = inc.signatures().toPandas().sort_values("file_id", ignore_index=True)
    pairs2 = inc.pairs().toPandas().sort_values(["a", "b"], ignore_index=True)
    assert sigs2[["file_id", "simhash"]].equals(sigs1[["file_id", "simhash"]]), \
        "retry of an uncommitted batch dropped its signatures"
    assert pairs2.equals(pairs1)
    assert inc._is_committed(0)

    # and a subsequent batch still dedupes against the recovered history
    inc.process_batch(spark.read.parquet(drops["paths"][1]), 1)
    assert inc.signatures().count() > len(sigs1)


def test_auto_compaction_in_commit_path(spark, drops, cfg, tmp_path):
    """compact_every=2 must fold state inside foreachBatch commit after
    every 2nd committed batch, with pairs/signatures unchanged."""
    inc = IncrementalDedup(spark, str(tmp_path / "w"), cfg, compact_every=2)
    baseline = IncrementalDedup(spark, str(tmp_path / "b"), cfg, compact_every=None)
    for i, p in enumerate(drops["paths"]):
        b = spark.read.parquet(p)
        inc.process_batch(b, i)
        baseline.process_batch(b, i)
    # 3 batches, compact after batch idx 1 (2 committed): dirs 0,1 folded
    # into batch_id=-1; batch 2 staged on top
    subdirs = sorted(e for e in os.listdir(inc.sig_dir) if e.startswith("batch_id="))
    assert subdirs == ["batch_id=-1", "batch_id=2"], subdirs
    got = inc.pairs().toPandas().sort_values(["a", "b"], ignore_index=True)
    want = baseline.pairs().toPandas().sort_values(["a", "b"], ignore_index=True)
    assert got.equals(want)
    assert inc.signatures().count() == baseline.signatures().count()


def test_compaction_preserves_state_and_shrinks_files(spark, drops, cfg, tmp_path):
    inc = IncrementalDedup(spark, str(tmp_path / "w"), cfg)
    for i, p in enumerate(drops["paths"]):
        inc.process_batch(spark.read.parquet(p), i)
    before = inc.pairs().toPandas().sort_values(["a", "b"], ignore_index=True)
    sig_before = inc.signatures().toPandas().sort_values("file_id", ignore_index=True)

    stats = inc.compact()
    assert stats["pairs"]["files_after"] < stats["pairs"]["files_before"]
    assert stats["signatures"]["files_after"] < stats["signatures"]["files_before"]

    after = inc.pairs().toPandas().sort_values(["a", "b"], ignore_index=True)
    sig_after = inc.signatures().toPandas().sort_values("file_id", ignore_index=True)
    assert before.equals(after)
    assert sig_before[["file_id", "simhash"]].equals(sig_after[["file_id", "simhash"]])

    # post-compaction batches still land + dedupe against the snapshot
    inc.process_batch(spark.read.parquet(drops["paths"][0]), 99)
    assert inc.pairs().toPandas().sort_values(["a", "b"], ignore_index=True).equals(after)


def test_stateful_user_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user totals carried in the engine's
    state store across micro-batches must equal the batch groupBy over
    the full data (maxFilesPerTrigger=1 over 2 drops forces >=2
    batches, so state crossing batches is actually exercised)."""
    from pyspark.sql import functions as F

    from codedup.streaming import stateful_user_totals

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/drop0")
    events.filter(F.col("event_id") % 2 == 1).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/drop1")
    import glob
    import os
    import shutil
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(sorted(glob.glob(src + "/drop*/*.parquet"))):
        shutil.copy(f, f"{flat}/d{i}.parquet")

    q = stateful_user_totals(spark, flat, str(tmp_path / "chk"))
    q.awaitTermination(300)

    got_all = spark.table("user_totals").toPandas()
    # update mode: last emitted row per user is current
    got = got_all.groupby("user_id").last()
    want = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .toPandas().set_index("user_id")
    )
    assert len(got) == len(want)
    merged = got.join(want, lsuffix="_g", rsuffix="_w")
    assert (merged.n_events_g == merged.n_events_w).all()
    assert (abs(merged.sum_value_g - merged.sum_value_w) < 0.02).all()
    # state actually crossed batches: some user emitted twice
    assert got_all.user_id.duplicated().any()


# --- compact() crash recovery (ADVICE r3 medium) -------------------------

def _pair_set(inc):
    df = inc.pairs().toPandas()
    return set(zip(df.a, df.b))


@pytest.fixture()
def committed_stream(spark, drops, cfg, tmp_path):
    """Three committed batches, auto-compaction off; returns (inc, pairs)."""
    inc = IncrementalDedup(spark, str(tmp_path / "w"), cfg, compact_every=None)
    for i, p in enumerate(drops["paths"]):
        inc.process_batch(spark.read.parquet(p), i)
    return inc, _pair_set(inc)


def test_compact_crash_before_snapshot_move_restores_state(committed_stream):
    """Crash window: live dir renamed aside, snapshot not yet in place.
    The old compact() order (rmtree live, then rename snapshot) lost the
    whole table here; the rename-aside order must restore it."""
    inc, want = committed_stream
    assert want, "fixture must produce pairs"
    d = inc.pairs_dir
    os.rename(d, d + "._old")                      # crash right after rename-aside
    os.makedirs(d + "._compact")                   # half-written snapshot tmp
    with open(os.path.join(d + "._compact", "part-junk.parquet"), "w") as f:
        f.write("not parquet")
    assert _pair_set(inc) == want                  # recovery restored ._old
    assert not os.path.isdir(d + "._old") and not os.path.isdir(d + "._compact")


def test_compact_crash_with_empty_live_dir_restores_state(committed_stream):
    """Crash one step later: empty live dir recreated, snapshot still in
    tmp.  The empty dir must not shadow the parked state."""
    inc, want = committed_stream
    d = inc.pairs_dir
    os.rename(d, d + "._old")
    os.makedirs(d)                                 # crash after makedirs
    assert _pair_set(inc) == want
    assert not os.path.isdir(d + "._old")


def test_compact_crash_after_snapshot_live_drops_leftover(committed_stream):
    """Crash after the snapshot moved in but before ._old cleanup: the
    snapshot wins, the parked copy is garbage-collected, content equal."""
    import shutil

    inc, want = committed_stream
    inc.compact()                                  # snapshot now live
    d = inc.pairs_dir
    shutil.copytree(d, d + "._old")                # simulate un-deleted parked dir
    assert _pair_set(inc) == want
    assert not os.path.isdir(d + "._old")


def test_compact_survives_crash_replay_loop(committed_stream, spark, drops):
    """compact -> simulated crash -> recovery -> compact again -> new
    batch: end-to-end the state is never lost or duplicated."""
    inc, want = committed_stream
    d = inc.pairs_dir
    os.rename(d, d + "._old")                      # crash mid-compact
    assert _pair_set(inc) == want                  # recovered
    inc.compact()                                  # clean compact succeeds
    assert _pair_set(inc) == want
    # replayed batch after all that is still a no-op
    inc.process_batch(spark.read.parquet(drops["paths"][0]), 0)
    assert _pair_set(inc) == want


def test_pre_stats_layout_bootstraps_and_persists(spark, drops, cfg, tmp_path):
    """Resuming a state layout from before the bucket_stats table
    existed must (a) bootstrap the stats from the bands table, (b)
    PERSIST the bootstrap so later batches see pre-stats history counts
    (not just post-upgrade deltas), and (c) produce the same cumulative
    pair set as an uninterrupted stream."""
    import shutil

    # uninterrupted reference stream over all 3 drops
    ref = IncrementalDedup(spark, str(tmp_path / "ref"), cfg)
    for i, p in enumerate(drops["paths"]):
        ref.process_batch(spark.read.parquet(p), i)
    want = {(r.a, r.b) for r in ref.pairs().collect()}

    # "old layout": run 2 batches, then delete the stats table
    inc = IncrementalDedup(spark, str(tmp_path / "up"), cfg)
    for i in range(2):
        inc.process_batch(spark.read.parquet(drops["paths"][i]), i)
    shutil.rmtree(inc.stats_dir)
    # batch 2 on the degraded layout: bootstrap fires
    inc.process_batch(spark.read.parquet(drops["paths"][2]), 2)
    assert os.path.isdir(os.path.join(inc.stats_dir, "batch_id=-1"))  # persisted
    got = {(r.a, r.b) for r in inc.pairs().collect()}
    assert got == want

    # the persisted bootstrap must carry PRE-stats history counts: the
    # merged stats totals equal a fresh groupBy over the bands table
    from pyspark.sql import functions as F

    bands = inc._read_or_none(inc.bands_dir)
    fresh = {(r.band, r.band_hash): (r.cnt, r.rep) for r in
             bands.groupBy("band", "band_hash")
             .agg(F.count(F.lit(1)).alias("cnt"), F.min("file_id").alias("rep"))
             .collect()}
    merged = {(r.band, r.band_hash): (r.cnt, r.rep) for r in
              inc._bucket_stats().groupBy("band", "band_hash")
              .agg(F.sum("cnt").alias("cnt"), F.min("rep").alias("rep"))
              .collect()}
    assert merged == fresh
