"""The counting-based recall accounting (VERDICT r4 #1) must agree
exactly with the pair-materializing form it replaces AND with a
brute-force itertools oracle — including the edge cases: truth keys the
pipeline never clustered, predicted clusters that mix truth families,
and singleton clusters on both sides."""

from __future__ import annotations

import itertools
import random

import pytest


def _brute(truth_rows, member_rows):
    """(n_truth, n_pred, n_inter) by enumerating pairs in python."""
    tc = dict(truth_rows)
    pc = dict(member_rows)
    truth_pairs = {
        tuple(sorted(p))
        for p in itertools.combinations(tc, 2) if tc[p[0]] == tc[p[1]]
    }
    tk = [k for k in pc if k in tc]
    pred_pairs = {
        tuple(sorted(p))
        for p in itertools.combinations(tk, 2) if pc[p[0]] == pc[p[1]]
    }
    return len(truth_pairs), len(pred_pairs), len(truth_pairs & pred_pairs)


def _score_all(spark, truth_rows, member_rows):
    import sys
    sys.path.insert(0, "tools")
    from recall_at_scale import score_counting, score_pairs

    truth = spark.createDataFrame(truth_rows, "key string, truth_cluster_id string")
    members = spark.createDataFrame(member_rows, "key string, cluster_id string")
    return score_counting(truth, members), score_pairs(truth, members)


CASES = {
    "perfect": (
        [("a", "t1"), ("b", "t1"), ("c", "t2"), ("d", "t2"), ("e", "t2")],
        [("a", "p1"), ("b", "p1"), ("c", "p2"), ("d", "p2"), ("e", "p2")],
    ),
    "split_and_merge": (  # pred splits t2 and merges across t1/t2
        [("a", "t1"), ("b", "t1"), ("c", "t2"), ("d", "t2"), ("e", "t2")],
        [("a", "p1"), ("c", "p1"), ("b", "p2"), ("d", "p2"), ("e", "p3")],
    ),
    "missing_truth_keys": (  # f, g never reached the members table
        [("a", "t1"), ("b", "t1"), ("f", "t1"), ("g", "t3")],
        [("a", "p1"), ("b", "p1"), ("x", "p1"), ("y", "p9")],
    ),
    "all_singletons": (
        [("a", "t1"), ("b", "t2"), ("c", "t3")],
        [("a", "p1"), ("b", "p2"), ("c", "p3")],
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_counting_equals_pairs_and_brute(spark, case):
    truth_rows, member_rows = CASES[case]
    want = _brute(truth_rows, member_rows)
    counting, pairs = _score_all(spark, truth_rows, member_rows)
    assert counting == pairs == want, case


def test_counting_equals_pairs_randomized(spark):
    """200-key random clusterings with heavy collisions — the identity
    sum C(n_tc, 2) = |pair intersection| holds on arbitrary shapes."""
    rng = random.Random(20260817)
    keys = [f"k{i}" for i in range(200)]
    truth_rows = [(k, f"t{rng.randrange(12)}") for k in keys]
    # members: drop 10% of keys, add 20 foreign keys, coarser clusters
    member_rows = [(k, f"p{rng.randrange(8)}") for k in keys if rng.random() > 0.1]
    member_rows += [(f"z{i}", f"p{rng.randrange(8)}") for i in range(20)]
    want = _brute(truth_rows, member_rows)
    counting, pairs = _score_all(spark, truth_rows, member_rows)
    assert counting == pairs == want
