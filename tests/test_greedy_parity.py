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


def test_greedy_seed_order_is_tuple_order_not_key_string(spark):
    """ADVICE r1: key-string order flips tuple order when one path is a
    prefix of another ('a'@ vs 'a!x': '@' > '!').  Scan order must be
    the (repo, path, commit) tuple like the oracle/reference.

    Structure: star around B=(r, a!x, c) with leaves A=(r, a, c) and
    C=(r, zz, c); no A-C edge.  Tuple order seeds A first ->
    groups [[A, B]] (C's only neighbor is then matched).  Key-string
    order would seed B first and absorb both -> [[B, A, C]]."""
    from codedup.stages.report import greedy_groups

    def key(p):
        return f"r/{p}@c"

    order = spark.createDataFrame(
        [(1, key("a"), "s1", "r", "a", "c"),
         (2, key("a!x"), "s2", "r", "a!x", "c"),
         (3, key("zz"), "s3", "r", "zz", "c")],
        "file_id long, key string, sha256 string, repo string, path string, commit string",
    )
    verified = spark.createDataFrame(
        [(1, 2, "near"), (2, 3, "near")], "a long, b long, kind string")
    groups = greedy_groups(verified, order)
    assert groups == [[key("a"), key("a!x")]]
