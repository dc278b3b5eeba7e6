"""Stage 3 — signatures: the first of exactly two Arrow boundaries.

Computes, per distinct-content representative, in ONE pass over the
content column (Arrow-batched, numpy-vectorized within each document):

    n_shingles  — distinct char-k-gram count
    minhash     — 128-perm MinHash signature, array<long>   (pHash analog, hasher.py:19-36)
    simhash     — 64-bit SimHash, long                      (dHash analog, hasher.py:39-47)

Reference computed three hashes in three separate passes per file
(dedup.py:156-166); here one decode + one shingle pass feeds both
signatures.  Batch size is bounded by spark.sql.execution.arrow.
maxRecordsPerBatch because ``content`` rows can be wide.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from codedup.config import DedupConfig

SIG_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType(), False),
    T.StructField("n_shingles", T.IntegerType(), False),
    T.StructField("minhash", T.ArrayType(T.LongType(), False), False),
    T.StructField("simhash", T.LongType(), False),
])


def compute_signatures(reps: DataFrame, cfg: DedupConfig) -> DataFrame:
    """representatives(file_id, content, ...) -> signatures table."""
    import os

    k, num_perm, seed, norm = cfg.shingle_k, cfg.num_perm, cfg.minhash_seed, cfg.normalize_ws
    mode = cfg.shingle_mode
    # captured driver-side into the closure so it reaches every worker
    fault_marker = os.environ.get("CODEDUP_FAULT_INJECT")  # test hook

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imports inside: runs on executors' Python workers
        import numpy as np

        from codedup import kernels as K

        for pdf in it:
            fids = pdf["file_id"].to_numpy()
            m = len(pdf)
            # per-row shingling keeps the per-row fault contract (a bad
            # row becomes the n_shingles = -1 sentinel, never a task
            # failure); the hash arithmetic below is batched across the
            # whole Arrow batch — row-identical to the per-doc kernels
            # (tests pin batch == per-doc), ~3x less per-doc overhead
            arrays: list[np.ndarray] = []
            n_arr = np.empty(m, dtype=np.int64)
            for i, text in enumerate(pdf["content"]):
                try:
                    if fault_marker and fault_marker in text:
                        raise RuntimeError("injected fault")
                    sh = K.shingle_hashes(text, k, normalize_ws=norm, mode=mode)
                    arrays.append(sh)
                    n_arr[i] = sh.size
                except Exception:
                    # never fail the task for one bad row: emit the
                    # FAULT sentinel (n_shingles = -1); the pipeline
                    # excludes it downstream and it stays visible in the
                    # signatures checkpoint (errors are never silent)
                    arrays.append(np.empty(0, dtype=np.uint64))
                    n_arr[i] = -1
            sizes = np.maximum(n_arr, 0)
            concat = (np.concatenate(arrays) if arrays
                      else np.empty(0, dtype=np.uint64))
            mh = K.minhash_signatures_batch(concat, sizes, num_perm, seed)
            sh64 = K.simhash64_batch(concat, sizes)
            out_mh = mh.tolist()
            for i in np.nonzero(n_arr < 0)[0]:
                out_mh[i] = []          # fault sentinel: empty signature
                sh64[i] = 0
            yield pd.DataFrame({
                "file_id": fids,
                "n_shingles": pd.array(n_arr, dtype="int32"),
                "minhash": out_mh,
                "simhash": pd.array(sh64, dtype="int64"),
            })

    return reps.select("file_id", "content").mapInPandas(batches, schema=SIG_SCHEMA)
