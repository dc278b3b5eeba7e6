"""Byte-for-byte greedy-grouping parity with the reference's rule
(dedup.py:204-240), via the driver-side utility."""


def test_greedy_groups_match_oracle(run_tiny, oracle_tiny):
    from codedup.stages.report import greedy_groups

    got = greedy_groups(run_tiny.verified, run_tiny.fingerprints)
    got_sets = {frozenset(g) for g in got}
    want_sets = set(oracle_tiny.greedy_groups)
    assert got_sets == want_sets


def test_greedy_is_refinement_of_cc(run_tiny):
    from codedup.stages.report import greedy_groups

    cc = run_tiny.members.select("key", "cluster_id").toPandas()
    home = dict(zip(cc.key, cc.cluster_id))
    for g in greedy_groups(run_tiny.verified, run_tiny.fingerprints):
        cids = {home[k] for k in g}
        assert len(cids) == 1, f"greedy group spans CC clusters: {g}"
