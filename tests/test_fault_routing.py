"""Per-row fault tolerance in the Arrow stages: one poisoned document
must not fail the job, must be visible as a FAULT sentinel in the
signatures checkpoint, and must not perturb results for other files."""

import pandas as pd

from codedup.config import DedupConfig


def test_signature_fault_is_routed_not_fatal(spark, tmp_path, monkeypatch):
    from codedup import pipeline

    files = pd.DataFrame(
        [
            ("org/a", "poison.py", "a" * 40, "python", "POISON_MARKER plus content " * 20),
            ("org/a", "x.py", "b" * 40, "python", "def f():\n    return 1\n" * 30),
            ("org/b", "x_copy.py", "c" * 40, "python", "def f():\n    return 1\n" * 30 + "# v2\n"),
        ],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    src = str(tmp_path / "files.parquet")
    files.to_parquet(src, index=False)

    monkeypatch.setenv("CODEDUP_FAULT_INJECT", "POISON_MARKER")
    cfg = DedupConfig(shuffle_partitions=4)
    res = pipeline.run(spark, [src], cfg, work_dir=str(tmp_path / "w"),
                       run_id="f", resume=False)

    sigs = spark.read.parquet(str(tmp_path / "w" / "runs" / "f" / "signatures")).toPandas()
    faults = sigs[sigs.n_shingles < 0]
    assert len(faults) == 1, "poisoned row must surface as exactly one sentinel"

    # the healthy near-dup pair is still found
    m = res.members.toPandas()
    assert set(m.path) == {"x.py", "x_copy.py"}
    assert m.cluster_id.nunique() == 1

    # and without the fault hook the same corpus signs all three rows
    monkeypatch.delenv("CODEDUP_FAULT_INJECT")
    res2 = pipeline.run(spark, [src], cfg, work_dir=str(tmp_path / "w2"),
                        run_id="f2", resume=False)
    sigs2 = spark.read.parquet(str(tmp_path / "w2" / "runs" / "f2" / "signatures")).toPandas()
    assert (sigs2.n_shingles >= 0).all()
