"""Generate committed golden files for the tiny tier from the
single-process oracle (FIXTURES.md §5).  Run once; output is committed
so tests detect drift in EITHER the oracle or the pipeline.

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from codedup.config import DedupConfig
from codedup.fixtures import generate_corpus
from codedup.oracle import run_oracle

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden", "tiny")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    cfg = DedupConfig()
    tables = generate_corpus("tiny")
    orc = run_oracle(tables["files"], cfg)

    pairs = orc.pairs.copy()
    pairs["jaccard"] = pairs["jaccard"].round(9)
    pairs["lcs_frac"] = pairs["lcs_frac"].round(9)
    pairs.sort_values(["a", "b"], ignore_index=True).to_json(
        os.path.join(OUT, "golden_pairs.json"), orient="records", indent=1
    )

    comps = sorted(sorted(c) for c in orc.components)
    clusters = [
        {"key": k, "cluster_id": i} for i, comp in enumerate(comps) for k in comp
    ]
    with open(os.path.join(OUT, "golden_clusters.json"), "w") as f:
        json.dump(clusters, f, indent=1)

    files = tables["files"]
    n_exact_groups = len(orc.exact_groups)
    report = {
        "config_fingerprint": cfg.fingerprint(),
        "total_files": int(len(files)),
        "total_bytes": int(files.content.str.encode("utf-8").str.len().sum()),
        "verified_near_pairs": int(len(orc.pairs)),
        "exact_groups": n_exact_groups,
        "duplicate_components": len(orc.components),
        "greedy_groups": len(orc.greedy_groups),
    }
    with open(os.path.join(OUT, "golden_report.json"), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
