"""Committed-golden tests (FIXTURES.md §5): the pipeline must reproduce
the golden cluster membership and pair set byte-for-byte.  Unlike the
oracle tests (which regenerate the oracle), these pin the expected
output in git — if kernels, fixtures, or pipeline semantics drift, this
fails even if oracle and pipeline drift together."""

import json
import os

import pytest

GOLD = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden", "tiny")


@pytest.fixture(scope="module")
def gold():
    with open(os.path.join(GOLD, "golden_pairs.json")) as f:
        pairs = json.load(f)
    with open(os.path.join(GOLD, "golden_clusters.json")) as f:
        clusters = json.load(f)
    with open(os.path.join(GOLD, "golden_report.json")) as f:
        report = json.load(f)
    return {"pairs": pairs, "clusters": clusters, "report": report}


def test_golden_config_current(gold, cfg):
    assert gold["report"]["config_fingerprint"] == cfg.fingerprint(), (
        "config changed since goldens were generated — regenerate via "
        "tools/make_goldens.py and review the diff"
    )


def test_cluster_membership_matches_golden(run_tiny, gold):
    golden_comps = {}
    for row in gold["clusters"]:
        golden_comps.setdefault(row["cluster_id"], set()).add(row["key"])
    golden = set(frozenset(v) for v in golden_comps.values())
    got_pdf = run_tiny.members.select("key", "cluster_id").toPandas()
    got = set(frozenset(g["key"]) for _, g in got_pdf.groupby("cluster_id"))
    assert got == golden


def test_verified_pairs_match_golden(run_tiny, gold):
    """Pair identity compared at content (sha256) level: golden pairs are
    between the oracle's first-seen representatives, pipeline pairs
    between min-file_id representatives — same contents either way."""
    fp = run_tiny.fingerprints.select("key", "file_id", "sha256").toPandas()
    key2sha = dict(zip(fp.key, fp.sha256))
    id2sha = dict(zip(fp.file_id, fp.sha256))

    golden = {}
    for p in gold["pairs"]:
        golden[frozenset((key2sha[p["a"]], key2sha[p["b"]]))] = p
    got = {}
    for r in run_tiny.verified.collect():
        got[frozenset((id2sha[r["a"]], id2sha[r["b"]]))] = r
    assert set(got) == set(golden)
    for k, row in got.items():
        assert abs(row["jaccard"] - golden[k]["jaccard"]) < 1e-9
        assert row["hamming"] == golden[k]["hamming"]


def test_report_counts_match_golden(run_tiny, gold, tiny):
    rep = run_tiny.report["summary"]
    assert rep["total_files"] == gold["report"]["total_files"]
    assert rep["total_size_bytes"] == gold["report"]["total_bytes"]
    assert rep["duplicate_groups"] == gold["report"]["duplicate_components"]


def test_cluster_samples_truncate(run_tiny):
    """W3: first-N member keys per cluster, in rank order, bounded."""
    from pyspark.sql import functions as F

    from codedup.stages.report import cluster_samples

    s = cluster_samples(run_tiny.members, n=3)
    rows = s.collect()
    assert rows and all(1 <= len(r["sample_keys"]) <= 3 for r in rows)
    # rank-1 (keep) member always leads the sample
    keeps = {r["cluster_id"]: r["key"]
             for r in run_tiny.members.filter(F.col("rank") == 1).collect()}
    assert all(r["sample_keys"][0] == keeps[r["cluster_id"]] for r in rows)
