"""Small-tier (SF=0.001-equivalent, FIXTURES §4) end-to-end gate:
cluster set must exactly match the single-process oracle at 4,556
files.  ~3 min (oracle is O(n^2)); opt-in via CODEDUP_SLOW=1 so the
default `pytest -x -q` stays fast — results recorded in
BENCH/BASELINE.md."""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("CODEDUP_SLOW"), reason="set CODEDUP_SLOW=1 to run"
)


def test_small_tier_exact_match(spark, cfg, tmp_path):
    from codedup import pipeline
    from codedup.fixtures import generate_corpus, write_corpus
    from codedup.oracle import run_oracle

    corpus = generate_corpus("small")
    orc = run_oracle(corpus["files"], cfg)
    paths = write_corpus(str(tmp_path / "corpus"), "small")
    res = pipeline.run(spark, [paths["files"]], cfg,
                       work_dir=str(tmp_path / "work"), run_id="s", resume=False)
    m = res.members.select("key", "cluster_id").toPandas()
    spark_comps = set(frozenset(g["key"]) for _, g in m.groupby("cluster_id"))
    assert spark_comps == set(orc.components)
