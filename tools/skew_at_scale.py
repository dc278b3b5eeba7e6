"""Adversarial skew at a real tier (VERDICT r3 #5).

tests/test_skew.py proves the hot-bucket policy at toy scale; this
demonstrates the vendored-boilerplate pathology (SURVEY §4.2.2) at the
355k tier: inject ``n_hot`` near-identical variants of one boilerplate
file into the 200k-base corpus, run the pipeline, and check

  * the candidate stage stays LINEAR in the family size (the star
    policy pairs members with the bucket min — an unguarded join would
    add ~n_hot^2/2 ~ 3.2e7 pairs for n_hot=8000);
  * no task is hot: max per-partition candidate rows stays bounded;
  * recall/precision hold (the family must still cluster together);
  * wall stays within ~1.2x of the clean corpus at the same tier.

Prints one JSON line; feeds the skew section of BENCH/BASELINE.md.

Usage: python tools/skew_at_scale.py [n_base] [n_hot] [corpus_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000
    corpus = sys.argv[3] if len(sys.argv) > 3 else \
        os.path.join(tempfile.gettempdir(), f"codedup_skew_{n_base}_{n_hot}")

    from codedup.fixtures import write_corpus

    if not os.path.exists(os.path.join(corpus, "files.parquet")):
        print(f"# generating skew corpus n_base={n_base} n_hot={n_hot} ...",
              file=sys.stderr, flush=True)
        write_corpus(corpus, "bench", n_base=n_base, n_hot_family=n_hot)

    with tempfile.TemporaryDirectory(prefix="skew_work_") as work:
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "recall_at_scale.py"),
             corpus, work, "32"],
            capture_output=True, text=True, check=True, cwd=os.path.join(HERE, ".."),
        )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        # per-partition candidate counts from the stage manifest
        import glob

        cand = {}
        for m in glob.glob(os.path.join(work, "runs", "recall", "*.manifest.json")):
            with open(m) as f:
                d = json.load(f)
            if d["stage"] == "candidates":
                cand = d
    per_part = [int(v) for v in cand.get("partitions", {}).values()] or [0]
    r.update({
        "n_hot": n_hot,
        "candidate_rows": cand.get("rows"),
        "candidate_max_partition": max(per_part),
        "candidate_partitions": len(per_part),
        "quadratic_bound_would_be": n_hot * (n_hot - 1) // 2,
    })
    print(json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
