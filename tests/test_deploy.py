"""Deployment-contract tests: the package must work when shipped as a
zip via ``spark-submit --py-files codedup.zip`` (north_rule's mandated
launch path).  ADVICE r3: the golden model JSONs used to live outside
the package and were open()ed at import time, so a zipped install
crashed on ``import codedup.queries``; they now ship inside
``codedup/golden`` and load through importlib.resources.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest: str) -> str:
    """Zip the codedup package exactly like tools/submit_demo.sh does."""
    with zipfile.ZipFile(dest, "w") as z:
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, "codedup")):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith((".py", ".json")):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return dest


def test_query_catalog_imports_from_zip(tmp_path):
    """Importing the FULL query catalog (incl. the golden-pinned IVF and
    LR oracles) from a zip, with the repo checkout absent from sys.path,
    must succeed — this is what --py-files deployment does."""
    z = build_zip(str(tmp_path / "codedup.zip"))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from codedup.golden import load_golden\n"
        "import codedup.queries as q\n"
        "assert len(load_golden('ivf_centroids.json')['centroids']) == 16\n"
        "assert len(load_golden('feedback_lr.json')['coef']) == 64\n"
        "assert 'ann_ivf_topk' in q.ORACLES and 'feedback_model_predictions' in q.ORACLES\n"
        "assert len(q.QUERIES) == len(q.ORACLES)\n"
        "import codedup\n"
        "assert codedup.__file__.startswith(%r), codedup.__file__\n"
        "print('zip-ok')\n"
    ) % (z, z)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=str(tmp_path),  # repo NOT on path
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "zip-ok" in out.stdout


@pytest.mark.skipif(os.environ.get("CODEDUP_SLOW") != "1",
                    reason="spark-submit e2e is slow; set CODEDUP_SLOW=1")
def test_spark_submit_py_files_demo(tmp_path):
    """The full deploy contract (VERDICT r3 #8): zip the package,
    spark-submit the demo job on local[2] with --py-files, assert the
    job writes its report.  Guards the packaging path against rot."""
    import shutil

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        # pyspark wheel installs bin/spark-submit next to the interpreter
        cand = os.path.join(os.path.dirname(sys.executable), "spark-submit")
        spark_submit = cand if os.path.exists(cand) else None
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    z = build_zip(str(tmp_path / "codedup.zip"))
    corpus = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    # job script is self-contained: reads parquet, runs the pipeline,
    # writes report.json (same shape tools/submit_demo.sh drives)
    job = str(tmp_path / "job.py")
    with open(job, "w") as f:
        f.write(
            "import json, sys\n"
            "from pyspark.sql import SparkSession\n"
            "from codedup import pipeline\n"
            "from codedup.config import DedupConfig\n"
            "spark = SparkSession.builder.getOrCreate()\n"
            "res = pipeline.run(spark, [sys.argv[1]], DedupConfig(shuffle_partitions=4),\n"
            "                   work_dir=sys.argv[2], run_id='demo', resume=False)\n"
            "n = res.verified.count()\n"
            "print('SUBMIT_DEMO_PAIRS=%d' % n)\n"
        )
    from codedup.fixtures import write_corpus

    paths = write_corpus(corpus, "tiny")
    out = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", z,
         job, paths["files"], out_dir],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "SUBMIT_DEMO_PAIRS=" in out.stdout
    n = int(out.stdout.split("SUBMIT_DEMO_PAIRS=")[1].split()[0])
    assert n > 0
