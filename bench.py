"""Benchmark harness.

Default mode (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and print ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling mode (--scaling): run the dedup pipeline on the same input at
local[8] and local[32] and report throughput + scaling efficiency
(BASELINE.md sandbox protocol for the N vs 4N executors criterion);
results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "text_stats",
    "token_count_by_lang",
    "ann_topk_cosine",
    "embedding_similar_pairs",
    "pricing_summary",
    "top_orders_per_customer",
    "revenue_by_nation",
    "events_daily_top_types",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_headline() -> None:
    from codedup.queries import QUERIES
    from codedup.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(f"local[{cpus}]", app_name="codedup-bench",
                          shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()  # count() forces full execution
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
    }))
    spark.stop()


def run_scaling(n_files: int = 20000) -> None:
    """Same dedup job, same input, two parallelism levels (N=8, 4N=32
    cores).  Efficiency = (thr_32 / thr_8) / 4 (BASELINE.md protocol)."""
    import tempfile

    from codedup.config import DedupConfig
    from codedup.fixtures import write_corpus
    from codedup.session import build_session
    from codedup import pipeline

    corpus_dir = os.path.join(tempfile.gettempdir(), f"codedup_bench_{n_files}")
    if not os.path.exists(os.path.join(corpus_dir, "files.parquet")):
        print(f"# generating bench corpus n_base={n_files} ...", file=sys.stderr)
        write_corpus(corpus_dir, "bench", n_base=n_files)

    cfg = DedupConfig()
    results = {}
    for cores in (8, 32):
        spark = build_session(f"local[{cores}]", app_name=f"codedup-scale-{cores}",
                              shuffle_partitions=max(cores * 2, 16))
        spark.sparkContext.setLogLevel("ERROR")
        n_input = spark.read.parquet(f"{corpus_dir}/files.parquet").count()
        with tempfile.TemporaryDirectory() as work:
            t0 = time.time()
            pipeline.run(spark, [f"{corpus_dir}/files.parquet"], cfg,
                         work_dir=work, run_id="bench", resume=False)
            dt = time.time() - t0
        results[cores] = {"wall_s": round(dt, 2), "files_per_sec": round(n_input / dt, 1)}
        print(f"# local[{cores}]: {dt:.1f}s -> {n_input / dt:.0f} files/s", file=sys.stderr)
        spark.stop()

    eff = (results[32]["files_per_sec"] / results[8]["files_per_sec"]) / 4.0
    out = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_files": n_files,
        "local8": results[8],
        "local32": results[32],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        n = int(sys.argv[sys.argv.index("--scaling") + 1]) if len(sys.argv) > 2 else 20000
        run_scaling(n)
    else:
        run_headline()
