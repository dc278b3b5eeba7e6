"""Pinned offline-trained model goldens that ship WITH the package.

These JSON artifacts (IVF coarse-quantizer centroids, folded logistic-
regression coefficients) are produced by the offline trainers in
tools/ and consumed at query time as literals — the production shape:
the iterative optimizer never runs at query time, the trained model
travels with the code.  They live inside the ``codedup`` package (not
a repo-relative fixtures dir) so the ``spark-submit --py-files
codedup.zip`` deployment documented in cli.py ships them; loading goes
through importlib.resources, which reads from a zip as happily as from
a directory (ADVICE r3: the old ``__file__/../fixtures`` open() raised
at import time under any install without the repo checkout).
"""

from __future__ import annotations

import json
from functools import lru_cache


@lru_cache(maxsize=None)
def load_golden(name: str) -> dict:
    """Load a committed golden JSON by file name (zip-safe)."""
    from importlib import resources

    return json.loads(resources.files(__name__).joinpath(name).read_text())
