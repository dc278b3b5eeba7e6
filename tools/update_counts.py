"""Regenerate the query/test counts quoted in STATUS.md / README.md /
COVERAGE.md from the live catalog and pytest collection (VERDICT r2 #9:
hand-synced counts drifted three times in round 2).

Usage: python tools/update_counts.py        # rewrites in place, prints diffs
tests/test_doc_counts.py asserts the documented query counts match
len(QUERIES)/len(ORACLES), so stale docs fail the suite.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, ".")

ROOT = os.path.join(os.path.dirname(__file__), "..")
DOCS = ["STATUS.md", "README.md", "COVERAGE.md"]


def counts() -> dict:
    from codedup.queries import ORACLES, QUERIES

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd=ROOT,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    n_tests = int(m.group(1)) if m else None
    return {
        "n_queries": len(QUERIES),
        "n_oracle": len(ORACLES),
        "n_rows_only": len(QUERIES) - len(ORACLES),
        "n_tests": n_tests,
    }


def patterns(c: dict) -> list[tuple[str, str]]:
    nq, no, nro, nt = c["n_queries"], c["n_oracle"], c["n_rows_only"], c["n_tests"]
    pats = [
        (r"\d+ queries; \d+ exact vs DuckDB at sf0\.01, \d+ rows-only",
         f"{nq} queries; {no} exact vs DuckDB at sf0.01, {nro} rows-only"),
        (r"all \d+ catalog queries", f"all {nq} catalog queries"),
        (r"query catalog \(\d+\)", f"query catalog ({nq})"),
        (r"FULL query catalog \(\d+ queries", f"FULL query catalog ({nq} queries"),
        (r"\d+-query catalog", f"{nq}-query catalog"),
        (r"\d+/\d+ value-exact", f"{no}/{nq} value-exact"),
    ]
    if nt is not None:
        pats += [
            (r"\d+ tests green", f"{nt} tests green"),
            (r"# \d+ tests \(CODEDUP_SLOW", f"# {nt} tests (CODEDUP_SLOW"),
        ]
    return pats


def main() -> None:
    c = counts()
    print(f"catalog: {c['n_queries']} queries, {c['n_oracle']} oracle-exact, "
          f"{c['n_rows_only']} rows-only; pytest collected: {c['n_tests']}")
    for doc in DOCS:
        path = os.path.join(ROOT, doc)
        with open(path) as f:
            text = f.read()
        new = text
        for pat, repl in patterns(c):
            new = re.sub(pat, repl, new)
        if new != text:
            with open(path, "w") as f:
                f.write(new)
            print(f"updated {doc}")
        else:
            print(f"unchanged {doc}")


if __name__ == "__main__":
    main()
