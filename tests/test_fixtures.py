"""Fixture-generator invariants (FIXTURES.md §3/§6)."""

from codedup.fixtures import generate_corpus


def test_deterministic():
    a = generate_corpus("tiny")
    b = generate_corpus("tiny")
    for name in ("files", "truth_pairs", "truth_clusters"):
        assert a[name].equals(b[name]), name


def test_key_uniqueness_and_schema(tiny):
    f = tiny["tables"]["files"]
    assert list(f.columns) == ["repo", "path", "commit", "lang", "content"]
    assert not f.duplicated(["repo", "path", "commit"]).any()
    assert f.commit.str.len().eq(40).all()


def test_near_pairs_above_lsh_curve(tiny):
    near = tiny["tables"]["truth_pairs"].query("relation == 'near'")
    assert len(near) > 20
    assert near.expected_jaccard.min() >= 0.85


def test_composition(tiny):
    tp = tiny["tables"]["truth_pairs"]
    assert set(tp.relation.unique()) <= {"exact", "near", "boilerplate"}
    assert (tp.query("relation=='exact'").expected_jaccard == 1.0).all()
    # vendored-library giant cluster exists
    assert (tp.mutation == "vendored").sum() >= 5


def test_truth_closure_is_transitive(tiny):
    tc = tiny["tables"]["truth_clusters"]
    tp = tiny["tables"]["truth_pairs"].query("relation != 'boilerplate'")
    cid = dict(zip(tc.key, tc.truth_cluster_id))
    for _, r in tp.iterrows():
        assert cid[r.a] == cid[r.b]


def test_hot_family_injection():
    """n_hot_family plants the vendored-boilerplate pathology: that many
    near-identical variants, all truth near-dups of one master, all
    above the LSH s-curve floor (SURVEY §4.2.2, VERDICT r3 #5)."""
    from codedup.fixtures import generate_corpus

    base = generate_corpus("tiny", seed=42)
    hot = generate_corpus("tiny", seed=42, n_hot_family=50)
    assert len(hot["files"]) == len(base["files"]) + 50
    fam = hot["truth_pairs"][hot["truth_pairs"].mutation == "hot_family"]
    assert len(fam) == 49                      # master x 49 variants
    assert (fam.expected_jaccard >= 0.86).all()
    # one truth cluster holds the whole family
    keys = set(fam.a) | set(fam.b)
    tc = hot["truth_clusters"]
    cids = tc[tc.key.isin(keys)].truth_cluster_id.unique()
    assert len(cids) == 1
    # determinism
    again = generate_corpus("tiny", seed=42, n_hot_family=50)
    assert hot["files"].equals(again["files"])
