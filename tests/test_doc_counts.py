"""Docs must quote the live catalog counts (VERDICT r2 #9) —
tools/update_counts.py regenerates them; this test is the drift alarm."""

import os
import re

from codedup.queries import ORACLES, QUERIES

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_status_oracle_gate_line_matches_catalog():
    with open(os.path.join(ROOT, "STATUS.md")) as f:
        text = f.read()
    m = re.search(r"(\d+) queries; (\d+) exact vs DuckDB at sf0\.01, (\d+) rows-only",
                  text)
    assert m, "oracle-gate count line missing from STATUS.md"
    assert int(m.group(1)) == len(QUERIES)
    assert int(m.group(2)) == len(ORACLES)
    assert int(m.group(3)) == len(QUERIES) - len(ORACLES)


def test_readme_catalog_count_matches():
    with open(os.path.join(ROOT, "README.md")) as f:
        text = f.read()
    m = re.search(r"query catalog \((\d+)\)", text)
    assert m and int(m.group(1)) == len(QUERIES)


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)
