"""Stage 1 — fingerprint: identity + exact-content hash, pure codegen.

Reference analogs: sha256 kernel K1 (hasher.py:10-16) and file stat S4
(dedup.py:116-122).  Everything is a JVM built-in — ``sha2``,
``xxhash64``, ``octet_length`` — so this stage must show NO Python
eval nodes in its plan (tested in tests/test_explain_purity.py).

The sha256 column doubles as the per-row invariant vs the source table
(BASELINE.json:15): any downstream row joined back to the source must
agree on sha256(content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codedup.ids import with_ids


def fingerprint(files: DataFrame) -> DataFrame:
    """files -> + file_id, key, sha256, size (bytes of utf-8 content)."""
    return (
        with_ids(files)
        .withColumn("sha256", F.sha2(F.col("content").cast("binary"), 256))
        .withColumn("size", F.octet_length("content").cast("long"))
    )
