"""The two verify-stage budget knobs (VERDICT r3 #1): the JVM MinHash-
agreement prefilter margin and the LCS content cap are DedupConfig
fields, participate in the config fingerprint (so checkpoint caches
invalidate on change), and demonstrably change stage behavior without
changing results at the defaults.  tools/sweep_verify.py measures their
cost/recall trade-off at the 355k/888k tiers (BENCH/BASELINE.md)."""

from __future__ import annotations

import pytest

from codedup import kernels as K
from codedup.config import DedupConfig


def test_knobs_participate_in_config_fingerprint():
    base = DedupConfig()
    assert base.with_(minhash_prefilter_margin=0.05).fingerprint() != base.fingerprint()
    assert base.with_(lcs_max_chars=4000).fingerprint() != base.fingerprint()
    assert base.with_(minhash_prefilter_margin=None).fingerprint() != base.fingerprint()


def test_lcs_cap_bounds_the_computation():
    """The cap truncates BOTH sides before the suffix array — a shared
    substring past the cap must not be seen, and within the cap the
    fraction is over the truncated min-length (the cost bound is real)."""
    shared = "x" * 300
    a = "A" * 1000 + shared
    b = "B" * 1000 + shared
    assert K.lcs_fraction(a, b, max_chars=20000) == pytest.approx(300 / 1300)
    # capped at 500: the shared tail is cut off entirely
    assert K.lcs_fraction(a, b, max_chars=500) < 300 / 1300
    assert K.lcs_length(a, b, max_chars=500) < 300


def test_margin_prefilter_preserves_results_on_truth_corpus(spark, tiny, cfg, tmp_path):
    """margin=None (prefilter off) and the default 0.15 must produce the
    IDENTICAL verified pair set on the tiny truth corpus — the prefilter
    is a cost knob, not a semantics knob, at the default setting."""
    from codedup import pipeline

    def pairs(c, tag):
        res = pipeline.run(spark, [tiny["paths"]["files"]], c,
                           work_dir=str(tmp_path / tag), run_id=tag, resume=False)
        pdf = res.verified.filter("kind != 'fault'").select("a", "b").toPandas()
        fp = res.fingerprints.select("file_id", "key").toPandas()
        id2k = dict(zip(fp.file_id, fp.key))
        return {frozenset((id2k[a], id2k[b])) for a, b in zip(pdf.a, pdf.b)}

    on = pairs(cfg, "m_on")                                   # margin 0.15
    off = pairs(cfg.with_(minhash_prefilter_margin=None), "m_off")
    assert on == off and on, "prefilter changed the verified pair set"


def test_tight_margin_is_a_subset_never_a_superset(spark, tiny, cfg, tmp_path):
    """A very tight margin (0.02 -> est_min 0.78) may drop borderline
    TRUE pairs (that is the documented trade) but can never ADD pairs —
    the Python-side exact verification is unchanged."""
    from codedup import pipeline

    def pairs(c, tag):
        res = pipeline.run(spark, [tiny["paths"]["files"]], c,
                           work_dir=str(tmp_path / tag), run_id=tag, resume=False)
        pdf = res.verified.filter("kind != 'fault'").select("a", "b").toPandas()
        return {tuple(sorted(t)) for t in zip(pdf.a, pdf.b)}

    loose = pairs(cfg.with_(minhash_prefilter_margin=None), "loose")
    tight = pairs(cfg.with_(minhash_prefilter_margin=0.02), "tight")
    assert tight <= loose
