"""M8 — skew pathology end-to-end (SURVEY §4.2.2, FIXTURES §3.5).

A corpus where hundreds of near-identical files share every LSH band
(the vendored-library pathology) must (a) complete without an O(k^2)
pair blowup — candidate count stays linear in the hot-cluster size via
star collapse — and (b) still produce the one correct giant cluster."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from codedup.config import DedupConfig
from codedup.stages.banding import band_rows
from codedup.stages.candidates import candidate_pairs
from codedup.stages.exact import representatives
from codedup.stages.fingerprint import fingerprint
from codedup.stages.signatures import compute_signatures


@pytest.fixture(scope="module")
def skew_corpus(tmp_path_factory):
    """300 near-identical copies of one file (tiny seeded edits) + 50
    unrelated files."""
    rng = np.random.default_rng(9)
    base = "".join(f"int vendored_fn_{i}(int a) {{ return a * {i}; }}\n" for i in range(60))
    rows = []
    for c in range(300):
        text = base + f"// vendored copy marker {int(rng.integers(0, 3))}\n"
        rows.append((f"org{c % 10:02d}/repo{c:04d}", f"third_party/lib_{c}.cc",
                     f"{c:040d}", "cpp", text))
    for u in range(50):
        body = "".join(
            f"def fn_{u}_{i}(x): return x + {int(rng.integers(0, 1 << 20))}\n"
            for i in range(40)
        )
        rows.append((f"org99/repo{u:04d}", f"src/mod_{u}.py", f"u{u:039d}", "python", body))
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    p = str(tmp_path_factory.mktemp("skew") / "files.parquet")
    pdf.to_parquet(p, index=False)
    return {"path": p, "n_vendored": 300, "n_other": 50}


def test_hot_buckets_star_collapse_bounds_candidates(spark, skew_corpus):
    cfg = DedupConfig(band_bucket_cap=32)
    fp = fingerprint(spark.read.parquet(skew_corpus["path"]))
    reps = representatives(fp)
    n_reps = reps.count()
    sigs = compute_signatures(reps.select("file_id", "content"), cfg)
    bands = band_rows(sigs, cfg)
    cands = candidate_pairs(bands, cfg)
    n_cands = cands.count()
    # naive all-pairs in the vendored cluster alone would be ~300*299/2
    # = 44,850 pairs; the star-collapsed bound is O(bands * members)
    assert n_cands < cfg.bands * n_reps, f"{n_cands} candidates — hot bucket exploded"


def test_skew_cluster_membership_correct(spark, skew_corpus, tmp_path):
    from codedup import pipeline

    cfg = DedupConfig(band_bucket_cap=32)
    res = pipeline.run(spark, [skew_corpus["path"]], cfg,
                       work_dir=str(tmp_path / "w"), run_id="skew", resume=False)
    members = res.members.toPandas()
    vendored = members[members.path.str.startswith("third_party/")]
    # every vendored copy lands in ONE cluster
    assert len(vendored) == skew_corpus["n_vendored"]
    assert vendored.cluster_id.nunique() == 1
    # and no unrelated file joined it
    others = members[~members.path.str.startswith("third_party/")]
    assert not set(others.cluster_id) & set(vendored.cluster_id)
