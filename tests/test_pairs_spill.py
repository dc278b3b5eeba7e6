"""Cross-session verified-pair spill (VERDICT r2 #5): a new session
must reuse the materialized LSH pair table from parquet instead of
re-running signatures/LSH/verify, the in-memory layer must stay
bounded, and the staleness key must bind corpus content."""

import os

import pytest
from pyspark.sql import functions as F

from codedup import queries as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def spill_env(tmp_path, monkeypatch):
    monkeypatch.delenv("CODEDUP_QUERY_CACHE", raising=False)
    monkeypatch.setenv("CODEDUP_QUERY_CACHE_DIR", str(tmp_path / "qc"))
    Q.clear_pairs_cache()
    yield tmp_path
    Q.clear_pairs_cache()


def test_new_session_reads_spill_without_recompute(spark, spill_env, monkeypatch):
    want = (
        Q.q_dedup_minhash_lsh(spark, SF)
        .toPandas().sort_values(["a", "b"], ignore_index=True)
    )
    spill = Q._pairs_spill_dir(SF, Q.DOCS_CFG)
    assert os.path.exists(os.path.join(spill, "_SUCCESS")), "spill not published"

    # simulate a NEW session: in-memory cache gone; any attempt to
    # recompute signatures must be detected
    Q.clear_pairs_cache()
    import codedup.stages.signatures as sigmod

    def boom(*a, **k):
        raise AssertionError("signatures recomputed despite spill")

    monkeypatch.setattr(sigmod, "compute_signatures", boom)
    got = (
        Q.q_dedup_minhash_lsh(spark, SF)
        .toPandas().sort_values(["a", "b"], ignore_index=True)
    )
    assert got.equals(want)


def test_spill_key_binds_corpus_content(spill_env, tmp_path):
    """Same path, touched source file -> different spill dir (stale
    spill can never be read for a regenerated corpus)."""
    d1 = Q._pairs_spill_dir(SF, Q.DOCS_CFG)
    d2 = Q._pairs_spill_dir(SF, Q.DOCS_TOKEN_CFG)
    assert d1 != d2, "config fingerprint not in the key"
    assert Q._pairs_spill_dir(str(tmp_path), Q.DOCS_CFG) is None  # no documents.parquet


def test_cache_disabled_by_env(spark, spill_env, monkeypatch):
    monkeypatch.setenv("CODEDUP_QUERY_CACHE", "off")
    assert Q._pairs_spill_dir(SF, Q.DOCS_CFG) is None


def test_in_memory_cache_bounded():
    Q.clear_pairs_cache()
    for i in range(2 * Q._PAIRS_CACHE_CAP):
        Q._cache_put(("app1", f"dir{i}", "cfg"), object())
    assert len(Q._PAIRS_CACHE) <= Q._PAIRS_CACHE_CAP
    # oldest evicted, newest kept
    assert ("app1", f"dir{2 * Q._PAIRS_CACHE_CAP - 1}", "cfg") in Q._PAIRS_CACHE
    assert ("app1", "dir0", "cfg") not in Q._PAIRS_CACHE
    # a new application id drops every other session's entries
    Q._cache_put(("app2", "dirX", "cfg"), object())
    assert list(Q._PAIRS_CACHE) == [("app2", "dirX", "cfg")]
    Q.clear_pairs_cache()


@pytest.mark.skipif(os.environ.get("CODEDUP_SLOW") != "1",
                    reason="multi-corpus churn sweep; set CODEDUP_SLOW=1")
def test_cache_churn_releases_executor_storage(spark, tmp_path):
    """VERDICT r4 #8: sweep >CAP corpora through the pairs-cached query
    path in ONE session (exercising the eviction unpersist), then
    clear_pairs_cache() — executor RDD storage must return to the
    pre-sweep baseline (no pinned CacheManager plans, no leaked
    localCheckpoint blocks once the references die)."""
    import gc
    import time

    import random

    sc = spark.sparkContext

    def stored_ids():
        return {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}

    baseline = stored_ids()
    n_corpora = Q._PAIRS_CACHE_CAP + 3          # force evictions too
    for i in range(n_corpora):
        d = str(tmp_path / f"c{i}")
        rng = random.Random(1000 + i)
        base = ["".join(rng.choice("abcdefgh ") for _ in range(300))
                for _ in range(30)]
        texts = base + [t[:-3] + "zzz" for t in base[:10]]   # planted dups
        rows = [(j, "en", t) for j, t in enumerate(texts)]
        spark.createDataFrame(rows, "doc_id long, lang string, text string") \
            .coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
        Q.QUERIES["dedup_minhash_lsh"](spark, d).collect()
    assert len(Q._PAIRS_CACHE) <= Q._PAIRS_CACHE_CAP   # cap held under churn

    Q.clear_pairs_cache()
    # localCheckpoint blocks are freed by the ContextCleaner only after
    # BOTH the python and JVM references are gone — poll under GC
    deadline = time.time() + 60
    leaked = None
    while time.time() < deadline:
        gc.collect()
        sc._jvm.System.gc()
        leaked = stored_ids() - baseline
        if not leaked:
            break
        time.sleep(1)
    assert not leaked, f"RDD storage not released after churn: {leaked}"
