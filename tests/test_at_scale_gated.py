"""CODEDUP_SLOW-gated tier runs: the same tools that produce the
BENCH/BASELINE.md large-tier evidence, exercised end-to-end at a
CI-sized tier so the harnesses cannot rot.  (The 355k/888k/1M numbers
in BENCH/BASELINE.md come from running these tools at full size on an
idle host; these tests prove the MACHINERY — equivalence assertions,
manifests, truth accounting — on ~35k files / 100k vectors.)"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SLOW = pytest.mark.skipif(os.environ.get("CODEDUP_SLOW") != "1",
                          reason="tier runs are slow; set CODEDUP_SLOW=1")


def _run_tool(name: str, *args: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", name), *args],
        capture_output=True, text=True, cwd=ROOT, timeout=3600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@SLOW
def test_streaming_equals_batch_tool(tmp_path):
    """N ordered drops through IncrementalDedup == the batch pipeline's
    pair set at the content level, with compaction enabled (VERDICT r3
    #4's machinery, CI tier)."""
    corpus = "/tmp/codedup_bench_20000"
    if not os.path.exists(os.path.join(corpus, "files.parquet")):
        from codedup.fixtures import write_corpus

        write_corpus(corpus, "bench", n_base=20000)
    r = _run_tool("streaming_at_scale.py", corpus, "6", "16",
                  "--work", str(tmp_path / "sw"))
    assert r["pair_sets_equal"] is True
    assert r["n_batches"] == 6
    assert len(r["batch_walls_s"]) == 6


@SLOW
def test_skew_tool_bounds_hot_family(tmp_path):
    """2,000-variant boilerplate family at the 35k tier: candidates stay
    far under the quadratic bound, no hot partition, recall holds."""
    r = _run_tool("skew_at_scale.py", "20000", "2000")
    quad = r["quadratic_bound_would_be"]
    assert r["candidate_rows"] < quad / 4, (r["candidate_rows"], quad)
    # no task hotter than 8x the mean (star/salt spread the family)
    mean = r["candidate_rows"] / max(r["candidate_partitions"], 1)
    assert r["candidate_max_partition"] <= max(8 * mean, 50_000)
    assert r["recall"] >= 0.999
    assert r["precision"] >= 0.999


@SLOW
def test_ann_tier_tool():
    """The ANN tier harness end-to-end at 50k vectors: quantizer trains
    on a sample, argmin assignment covers every row, search recall@10
    clears the 0.8 gate with real pruning, SemDeDup catches the planted
    co-located dups."""
    r = _run_tool("ann_at_scale.py", "50000", "/tmp/codedup_emb_50k", "16")
    assert r["assigned_rows"] == 50000
    assert r["recall_at_10"] >= 0.8
    assert r["scan_frac"] < 0.5
    assert r["planted_catch_rate"] >= 0.95


@SLOW
def test_recall_tool_counting_equals_pairs(tmp_path):
    """The recall harness end-to-end at the 35k tier, BOTH accountings
    (VERDICT r4 #1 machinery): the counting identity must reproduce the
    pair-join numbers exactly on a real pipeline run, and recall must
    clear the 0.99 gate."""
    corpus = "/tmp/codedup_bench_20000"
    if not os.path.exists(os.path.join(corpus, "files.parquet")):
        from codedup.fixtures import write_corpus

        write_corpus(corpus, "bench", n_base=20000)
    c = _run_tool("recall_at_scale.py", corpus, str(tmp_path / "w1"), "16")
    p = _run_tool("recall_at_scale.py", corpus, str(tmp_path / "w1"), "16",
                  "--pairs")   # resumes the same work dir: same clusters
    assert c["accounting"] == "counting" and p["accounting"] == "pairs"
    for k in ("truth_pairs", "pred_pairs", "inter_pairs"):
        assert c[k] == p[k], (k, c[k], p[k])
    assert c["recall"] >= 0.99 and c["precision"] >= 0.99
