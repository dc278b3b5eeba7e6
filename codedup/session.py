"""SparkSession construction with the engine's execution settings.

Centralizes the knobs SURVEY §4.2 calls out: AQE (+skew join), Arrow
batch size, shuffle partitions.  Tests use ``local[4]``; the scaling
bench uses ``local[8]`` vs ``local[32]``; a real deployment passes
``master=None`` and lets spark-submit decide.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

from codedup.config import DedupConfig


def _driver_memory(master: str | None) -> str:
    """Driver heap sizing.  In local mode the driver JVM IS every
    executor: all shuffle blocks, broadcast builds and checkpointed
    partitions live in this one heap, so sizing it like a lone driver
    (8g) leaves a local[32] run GC-bound — measured ~25-30% wall lost
    and 2x run-to-run variance on the shuffle-heavy sweep queries.
    Scale with the local core count (~0.75 GB/core, floor 8g); a real
    cluster driver (master=None -> spark-submit decides, or any
    non-local master) keeps the lean 8g default because executors bring
    their own heaps.  Override with CODEDUP_DRIVER_MEMORY."""
    env = os.environ.get("CODEDUP_DRIVER_MEMORY")
    if env:
        return env
    if master and master.startswith("local["):
        n = master[6:].rstrip("]")
        if n.isdigit():
            return f"{max(8, min(int(n) * 3 // 4, 48))}g"
    return "8g"


def build_session(
    master: str | None = "local[4]",
    app_name: str = "codedup",
    config: DedupConfig | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cfg = config or DedupConfig()
    # One BLAS thread per task slot (guide §4.5): every executor core
    # runs one Python worker, and numpy's OpenBLAS otherwise spawns
    # nproc threads PER WORKER — on a 32-slot host that is 32x32 = 1024
    # compute threads thrashing each other during the matmul kernels
    # (blocked sweep, ANN blocks).  Parallelism belongs to Spark; the
    # kernel gets one core.  Parameterised via CODEDUP_BLAS_THREADS for
    # deployments whose executors run fewer, fatter tasks.
    blas = os.environ.get("CODEDUP_BLAS_THREADS", "1")
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, blas)
    b = SparkSession.builder.appName(app_name)
    # the same pinning must reach remote executors' Python workers when
    # running under a real cluster manager (local mode inherits the
    # driver env set above)
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        b = b.config(f"spark.executorEnv.{var}", os.environ[var])
    if master:
        b = b.master(master)
    b = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions or cfg.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(cfg.arrow_max_records))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", os.path.join(tempfile.gettempdir(), "codedup_warehouse"))
        .config("spark.driver.memory", _driver_memory(master))
        # cap vector ISA at AVX2: OpenJDK 17's AVX-512 arraycopy stubs
        # (jlong_disjoint_arraycopy_avx3) segfault intermittently on
        # this VM's virtualized CPU when copying multi-MB primitive
        # arrays (reproduced twice under the blocked-sweep shuffle,
        # SEGV_MAPERR inside the stub).  AVX2 copies are within noise
        # for this workload; a deployment on trusted hardware can
        # override via CODEDUP_JVM_OPTS.
        .config("spark.driver.extraJavaOptions",
                os.environ.get("CODEDUP_JVM_OPTS", "-XX:UseAVX=2"))
        .config("spark.executor.extraJavaOptions",
                os.environ.get("CODEDUP_JVM_OPTS", "-XX:UseAVX=2"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
