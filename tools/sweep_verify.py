"""Verify-stage budget sweep (VERDICT r3 #1).

Verify (exact Jaccard + suffix-array LCS in the second Arrow stage) is
~70% of large-tier wall and THE 10^12 budget line.  Its two disclosed
levers are DedupConfig knobs:

  minhash_prefilter_margin  JVM-side MinHash-agreement prefilter:
                            candidates below jaccard_threshold - margin
                            never reach Python.  Smaller margin = tighter
                            filter = fewer pairs verified, at a bounded
                            recall risk (the estimator's sigma at 128
                            perms is ~0.035, so margin 0.10 is ~2.9 sigma
                            below a true threshold pair).
  lcs_max_chars             per-side content cap for the O(n log n)
                            suffix-array LCS confirmation signal.

This script runs the SAME corpus through the pipeline across a margin x
cap grid, each leg in a fresh subprocess (SparkContext reuse degrades
later legs) with a fresh work dir, and prints one JSON line per leg plus
a final summary table: verify-stage wall, total wall, recall, precision.
Results feed the sweep table in BENCH/BASELINE.md.

Usage: python tools/sweep_verify.py <corpus_dir> [--grid default|quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))

GRIDS = {
    # (margin, lcs_cap, lcs_signal): default first — it is the baseline
    # row.  lcs_signal=False is the big lever: with lcs_min_frac=0 the
    # LCS never gates, so skipping the signal changes zero pair
    # decisions while removing the verify stage's largest cost line.
    "default": [(0.15, 20000, True), (0.05, 20000, True),
                (0.15, 4000, True), (0.05, 4000, True),
                (0.15, 20000, False), (0.05, 20000, False)],
    "quick": [(0.15, 20000, True), (0.15, 20000, False)],
}


def run_leg(corpus: str, margin: float, cap: int, lcs: bool) -> dict:
    with tempfile.TemporaryDirectory(prefix="sweep_work_") as work:
        cmd = [sys.executable, os.path.join(HERE, "recall_at_scale.py"),
               corpus, work, "32", "--margin", str(margin), "--lcs-cap", str(cap)]
        if not lcs:
            cmd.append("--no-lcs")
        out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                             cwd=os.path.join(HERE, ".."))
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    corpus = sys.argv[1]
    grid = GRIDS["quick" if "--grid" in sys.argv
                 and sys.argv[sys.argv.index("--grid") + 1] == "quick"
                 else "default"]
    rows = []
    for margin, cap, lcs in grid:
        r = run_leg(corpus, margin, cap, lcs)
        r["verify_s"] = r["stages"].get("verified", 0.0)
        rows.append(r)
        print(json.dumps(r), flush=True)

    base = rows[0]
    print("\n| margin | lcs_cap | lcs_signal | verify s | total s | recall |"
          " precision | verify vs default |", flush=True)
    print("|---|---|---|---|---|---|---|---|", flush=True)
    for r in rows:
        rel = (r["verify_s"] / base["verify_s"]) if base["verify_s"] else 1.0
        print(f"| {r['margin']} | {r['lcs_cap']} | {r['lcs_signal']} "
              f"| {r['verify_s']:.1f} | {r['wall_s']:.1f} | {r['recall']:.6f} "
              f"| {r['precision']:.6f} | {rel:.2f}x |", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
