"""Property-based tests (SURVEY §5.2.4) — hypothesis generators over
the numpy kernels (no Spark session needed; fast)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from codedup import kernels as K

text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
    min_size=0, max_size=400,
)


@given(text)
@settings(max_examples=80, deadline=None)
def test_shingles_invariant_under_crlf_and_trailing_ws(t):
    base = K.shingle_hashes(t, 7)
    noisy = t.replace("\n", "   \r\n")
    assert np.array_equal(base, K.shingle_hashes(noisy, 7)) or "\n" not in t


@given(text, st.integers(2, 12))
@settings(max_examples=80, deadline=None)
def test_shingle_count_bound(t, k):
    # windows are over CODE POINTS (kernel v4), so the tight bound is
    # in characters, not utf-8 bytes
    sh = K.shingle_hashes(t, k, normalize_ws=False)
    n = len(t)
    assert sh.size <= max(n - k + 1, 1 if n else 0)


tokens_list = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=0, max_size=30
)


@given(tokens_list, st.integers(1, 5))
@settings(max_examples=80, deadline=None)
def test_token_shingle_count_bound_and_ws_invariance(toks, k):
    t = " ".join(toks)
    sh = K.shingle_hashes(t, k, mode="token")
    assert sh.size <= max(len(toks) - k + 1, 1 if toks else 0)
    noisy = "\t ".join(toks) + ("  \n" if toks else "")
    assert np.array_equal(sh, K.shingle_hashes(noisy, k, mode="token"))


@given(tokens_list, tokens_list, st.integers(1, 4))
@settings(max_examples=60, deadline=None)
def test_token_jaccard_equals_string_gram_jaccard(ta, tb, k):
    def grams(toks):
        if not toks:
            return set()
        return {" ".join(toks[i:i + k]) for i in range(max(len(toks) - k + 1, 1))}

    sa = K.shingle_hashes(" ".join(ta), k, mode="token")
    sb = K.shingle_hashes(" ".join(tb), k, mode="token")
    inter, union = K.jaccard_counts(sa, sb)
    ga, gb = grams(ta), grams(tb)
    assert (inter, union) == (len(ga & gb), len(ga | gb))


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300, unique=True),
       st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300, unique=True))
@settings(max_examples=60, deadline=None)
def test_minhash_estimate_within_bounds(xs, ys):
    A = np.array(sorted(xs), dtype=np.uint64)
    B = np.array(sorted(ys), dtype=np.uint64)
    jt = K.exact_jaccard(A, B)
    est = (K.minhash_signature(A, 128, 42) == K.minhash_signature(B, 128, 42)).mean()
    # 128 perms -> sigma <= sqrt(0.25/128) ~ 0.0442; allow 5 sigma
    assert abs(est - jt) <= 0.23


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=200, unique=True))
@settings(max_examples=50, deadline=None)
def test_identical_sets_estimate_one(xs):
    A = np.array(sorted(xs), dtype=np.uint64)
    assert (K.minhash_signature(A, 128, 42) == K.minhash_signature(A.copy(), 128, 42)).all()
    assert K.exact_jaccard(A, A) == 1.0
    assert K.hamming64(K.simhash64(A), K.simhash64(A.copy())) == 0


@given(text, text)
@settings(max_examples=40, deadline=None)
def test_lcs_bounds_and_symmetry(a, b):
    L = K.lcs_length(a, b)
    assert 0 <= L <= min(len(a), len(b))
    assert L == K.lcs_length(b, a)
    if L > 0:
        # a common substring of that length actually exists
        found = any(a[i:i + L] in b for i in range(len(a) - L + 1))
        assert found


@given(text, text, text)
@settings(max_examples=40, deadline=None)
def test_lcs_superstring_monotone(a, b, c):
    assert K.lcs_length(a, b + a) == len(a) if a else True
    assert K.lcs_length(a + c, a + c) == len(a + c)


@given(st.lists(st.integers(-1000, 1000), min_size=0, max_size=60))
@settings(max_examples=50, deadline=None)
def test_jaccard_counts_consistency(xs):
    A = np.unique(np.array(xs, dtype=np.int64)).astype(np.uint64)
    inter, union = K.jaccard_counts(A, A)
    assert inter == A.size and union == A.size
