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


def test_lcs_signal_off_changes_no_decisions(spark, tiny, cfg, tmp_path):
    """With lcs_min_frac=0 (default) the LCS never gates, so turning the
    signal off must yield the IDENTICAL pair set and clusters — only
    lcs_frac becomes the -1.0 not-computed sentinel (for non-identical
    pairs; normalized-equal pairs still report 1.0)."""
    from codedup import pipeline

    def run(c, tag):
        return pipeline.run(spark, [tiny["paths"]["files"]], c,
                            work_dir=str(tmp_path / tag), run_id=tag, resume=False)

    on = run(cfg, "lcs_on")
    off = run(cfg.with_(lcs_signal=False), "lcs_off")
    p_on = on.verified.filter("kind != 'fault'").select("a", "b").toPandas()
    p_off = off.verified.filter("kind != 'fault'").select("a", "b").toPandas()
    assert set(map(tuple, p_on.values)) == set(map(tuple, p_off.values))
    lfs = off.verified.filter("kind = 'near'").select("lcs_frac").toPandas().lcs_frac
    assert set(lfs.unique()) <= {-1.0, 1.0}
    # clusters identical
    c_on = on.members.select("key", "cluster_id").toPandas()
    c_off = off.members.select("key", "cluster_id").toPandas()
    assert sorted(map(tuple, c_on.values)) == sorted(map(tuple, c_off.values))


def test_lcs_gate_requires_signal():
    with pytest.raises(ValueError, match="lcs_signal"):
        DedupConfig(lcs_min_frac=0.5, lcs_signal=False)
