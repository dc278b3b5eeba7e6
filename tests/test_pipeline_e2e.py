"""End-to-end golden tests (SURVEY §5.2.3): cluster membership vs the
single-process oracle, recall/precision gates vs constructed truth,
stable ids across reruns, report shape."""

from conftest import co_membership, spark_components


def test_cluster_membership_matches_oracle_exactly(run_tiny, oracle_tiny):
    assert spark_components(run_tiny.members) == set(oracle_tiny.components)


def test_recall_vs_truth(run_tiny, tiny):
    """dup-pair recall >= 0.99 on co-membership pairs (BASELINE.md)."""
    tc = tiny["tables"]["truth_clusters"]
    truth_comps = [frozenset(g["key"]) for _, g in tc.groupby("truth_cluster_id")]
    truth = co_membership(truth_comps)
    got = co_membership(spark_components(run_tiny.members))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f}"


def test_precision_hard_negatives(run_tiny, tiny):
    """Same-template different-vocab files (and boilerplate-only
    overlap) must not cluster: every spark co-membership pair must be
    a truth pair or an oracle-verified transitive closure thereof."""
    tc = tiny["tables"]["truth_clusters"]
    truth_comps = [frozenset(g["key"]) for _, g in tc.groupby("truth_cluster_id")]
    truth = co_membership(truth_comps)
    got = co_membership(spark_components(run_tiny.members))
    precision = len(truth & got) / max(len(got), 1)
    assert precision >= 0.98, f"precision {precision:.4f}"


def test_greedy_groups_are_coarsened(run_tiny, oracle_tiny):
    """Reference greedy semantics (dedup.py:204-240) are a refinement of
    our components: every greedy group sits inside one spark cluster."""
    comps = spark_components(run_tiny.members)
    lookup = {}
    for comp in comps:
        for k in comp:
            lookup[k] = comp
    for g in oracle_tiny.greedy_groups:
        ms = sorted(g)
        home = lookup.get(ms[0])
        assert home is not None, f"greedy member {ms[0]} missing from clusters"
        for m in ms[1:]:
            assert lookup.get(m) is home, f"greedy group split: {ms[0]} vs {m}"


def test_verified_pairs_thresholds(run_tiny, cfg):
    pdf = run_tiny.verified.toPandas()
    assert (pdf.jaccard >= cfg.jaccard_threshold).all()
    assert (pdf.a < pdf.b).all()
    assert not pdf.duplicated(["a", "b"]).any()


def test_rank_one_per_cluster_is_largest(run_tiny):
    pdf = run_tiny.members.toPandas()
    for cid, g in pdf.groupby("cluster_id"):
        keep = g[g["rank"] == 1]
        assert len(keep) == 1
        assert keep["size"].iloc[0] == g["size"].max()


def test_report_summary_shape(run_tiny, tiny):
    s = run_tiny.report["summary"]
    assert s["total_files"] == len(tiny["tables"]["files"])
    assert s["duplicate_groups"] > 0
    assert s["files_in_groups"] >= 2 * s["duplicate_groups"]
    assert 0 < s["potential_savings_bytes"] < s["total_size_bytes"]


def test_rerun_identical_cluster_ids(spark, tiny, cfg, tmp_path):
    """Stable cluster ids across reruns AND under different shuffle
    partitioning (north_rule; W5)."""
    from codedup import pipeline

    r1 = pipeline.run(spark, [tiny["paths"]["files"]], cfg,
                      work_dir=str(tmp_path / "w1"), run_id="a", resume=False)
    m1 = r1.clusters.toPandas().sort_values("file_id", ignore_index=True)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        r2 = pipeline.run(spark, [tiny["paths"]["files"]], cfg,
                          work_dir=str(tmp_path / "w2"), run_id="b", resume=False)
        m2 = r2.clusters.toPandas().sort_values("file_id", ignore_index=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert m1.equals(m2)
