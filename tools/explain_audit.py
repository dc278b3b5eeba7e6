"""Dump `explain(formatted)` for every pipeline stage + headline query
and audit the physical plans for the properties SURVEY §4 demands:

  * parquet scans carry PushedFilters / pruned ReadSchema where expected
  * no BatchEvalPython / ArrowEvalPython / row-at-a-time Python anywhere
    (the only Python nodes allowed are the two mapInPandas stages)
  * broadcast joins where a side is a dimension (revenue_by_nation)
  * whole-stage codegen spans on the JVM stages

Writes EXPLAIN.md at the repo root.  Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from codedup.config import DedupConfig
from codedup.fixtures import write_corpus
from codedup.session import build_session

OUT = "EXPLAIN.md"
SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def main() -> int:
    import tempfile

    spark = build_session("local[8]", app_name="explain-audit", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig()

    corpus = tempfile.mkdtemp()
    paths = write_corpus(corpus, "tiny")

    from codedup.queries import QUERIES
    from codedup.stages.banding import band_rows
    from codedup.stages.candidates import candidate_pairs
    from codedup.stages.exact import exact_edges, representatives
    from codedup.stages.fingerprint import fingerprint
    from codedup.stages.signatures import compute_signatures
    from codedup.stages.verify import verify_pairs

    files = spark.read.parquet(paths["files"])
    fp = fingerprint(files)
    reps = representatives(fp)
    sigs = compute_signatures(reps.select("file_id", "content"), cfg)
    bands = band_rows(sigs, cfg)
    cands = candidate_pairs(bands, cfg)
    verified = verify_pairs(cands, reps, sigs, cfg)

    sections: list[tuple[str, str, list[str]]] = []  # (name, plan, audit notes)

    def audit(name, df, expect_no_python=True, expect_pushed=None, expect_broadcast=False):
        plan = plan_of(df)
        notes = []
        n_codegen = plan.count("WholeStageCodegen")
        notes.append(f"WholeStageCodegen spans: {n_codegen}")
        for node in ("BatchEvalPython", "ArrowEvalPython"):
            ok = node not in plan
            notes.append(f"{'OK' if ok else 'VIOLATION'}: no {node}")
        if expect_no_python:
            ok = "MapInPandas" not in plan
            notes.append(f"{'OK' if ok else 'VIOLATION'}: no MapInPandas (pure JVM stage)")
        else:
            notes.append(f"{'OK' if 'MapInPandas' in plan else 'VIOLATION'}: MapInPandas present (Arrow stage)")
        if expect_pushed:
            ok = "PushedFilters: [" in plan and expect_pushed in plan
            notes.append(f"{'OK' if ok else 'VIOLATION'}: filter '{expect_pushed}' pushed to scan")
        if expect_broadcast:
            ok = "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
            notes.append(f"{'OK' if ok else 'VIOLATION'}: broadcast join present")
        sections.append((name, plan, notes))
        return all(n.startswith(("OK", "WholeStageCodegen")) for n in notes)

    ok = True
    ok &= audit("stage: fingerprint", fp)
    ok &= audit("stage: exact_edges", exact_edges(fp))
    ok &= audit("stage: signatures (Arrow boundary #1)", sigs, expect_no_python=False)
    ok &= audit("stage: bands (downstream of parquet checkpoint)",
                band_rows(spark.read.parquet(paths["files"]).limit(0).sparkSession
                          .createDataFrame([], sigs.schema), cfg))
    ok &= audit("stage: candidates", candidate_pairs(
        spark.createDataFrame([], bands.schema), cfg))
    ok &= audit("stage: verify (Arrow boundary #2)", verified, expect_no_python=False)

    docs_pruned = spark.read.parquet(f"{SF}/documents.parquet").filter("lang = 'en'") \
        .select("doc_id", "lang")
    ok &= audit("scan: pushdown + column pruning", docs_pruned, expect_pushed="lang")

    ok &= audit("query: revenue_by_nation (broadcast dim)",
                QUERIES["revenue_by_nation"](spark, SF), expect_broadcast=True)
    ok &= audit("query: pricing_summary", QUERIES["pricing_summary"](spark, SF))
    ok &= audit("query: top_orders_per_customer", QUERIES["top_orders_per_customer"](spark, SF))
    ok &= audit("query: dedup_ngram_jaccard (blocked BLAS sweep)",
                QUERIES["dedup_ngram_jaccard"](spark, SF), expect_no_python=False)

    # round-2 plan properties: the bucketed ANN must be an EQUI hash
    # join (no BroadcastNestedLoopJoin), the block-matmul embedding
    # queries must be Arrow-staged with no driver collect in the plan
    def audit_no_bnlj(name, df, expect_no_python=True):
        plan = plan_of(df)
        notes = []
        bnlj_ok = "BroadcastNestedLoopJoin" not in plan
        notes.append(f"{'OK' if bnlj_ok else 'VIOLATION'}: no BroadcastNestedLoopJoin")
        hash_ok = any(j in plan for j in
                      ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))
        notes.append(f"{'OK' if hash_ok else 'VIOLATION'}: hash/merge join present")
        if not expect_no_python:
            notes.append(f"{'OK' if 'MapInPandas' in plan else 'VIOLATION'}: "
                         "MapInPandas present (Arrow stage)")
        sections.append((name, plan, notes))
        return bnlj_ok and hash_ok

    def audit_cogrouped(name, df, marker):
        plan = plan_of(df)
        notes = []
        bnlj_ok = "BroadcastNestedLoopJoin" not in plan
        notes.append(f"{'OK' if bnlj_ok else 'VIOLATION'}: no BroadcastNestedLoopJoin")
        m_ok = marker in plan
        notes.append(f"{'OK' if m_ok else 'VIOLATION'}: {marker} present "
                     "(cell-grouped Arrow stage)")
        sections.append((name, plan, notes))
        return bnlj_ok and m_ok

    # round-6: candidate scoring moved into a bucket-cogrouped Arrow
    # kernel; bucket equality is still the pruning key and the norm
    # joins stay broadcast hash joins
    ok &= audit_cogrouped("query: ann_lsh_bucketed (multi-probe bucket cogroup)",
                          QUERIES["ann_lsh_bucketed"](spark, SF),
                          "FlatMapCoGroupsInPandas")
    ok &= audit("query: ann_topk_cosine (block matmul)",
                QUERIES["ann_topk_cosine"](spark, SF), expect_no_python=False)
    ok &= audit("query: embedding_similar_pairs (block matmul)",
                QUERIES["embedding_similar_pairs"](spark, SF), expect_no_python=False)
    ok &= audit("query: doc_category_rules (single-pass rule tree)",
                QUERIES["doc_category_rules"](spark, SF))
    ok &= audit("query: substring_dedup_apply (ExactSubstr splice, pure JVM)",
                QUERIES["substring_dedup_apply"](spark, SF))
    ok &= audit("query: orders_keyset_page (serving filter + keyset page)",
                QUERIES["orders_keyset_page"](spark, SF))

    # round-4: IVF search and SemDeDup route through the full-scale
    # cell-grouped Arrow forms (argmin assignment + cogrouped gemm /
    # per-cell gram) — the audited shape is the cogroup/group stage
    # with NO BroadcastNestedLoopJoin and no join at all for SemDeDup
    # (the relational equi-join twins remain in ann.py, equivalence-
    # tested in tests/test_ann_scale_path.py)
    ok &= audit_cogrouped("query: ann_ivf_topk (argmin assignment + cell-cogrouped gemm)",
                          QUERIES["ann_ivf_topk"](spark, SF), "FlatMapCoGroupsInPandas")
    ok &= audit_cogrouped("query: semantic_dedup (per-cell gram, no join)",
                          QUERIES["semantic_dedup"](spark, SF), "FlatMapGroupsInPandas")
    ok &= audit("query: doc_repetition_stats (explode + group aggregations)",
                QUERIES["doc_repetition_stats"](spark, SF))
    ok &= audit("query: doc_pii_scrub (single-scan regex transform)",
                QUERIES["doc_pii_scrub"](spark, SF))
    # round-6: the family/slot discipline runs as ONE cogrouped Arrow
    # kernel (every step is (family, suffix)-local); audited shape is
    # the cogroup node replacing the former ~10-exchange window cascade
    ok &= audit_cogrouped("query: apply_plan_moves (cogrouped family assignment)",
                          QUERIES["apply_plan_moves"](spark, SF),
                          "FlatMapCoGroupsInPandas")
    ok &= audit_no_bnlj("query: winnowing_pairs (rare-fingerprint equi self-join)",
                        QUERIES["winnowing_pairs"](spark, SF))
    ok &= audit("query: paragraph_dedup_stats (paragraph-df join)",
                QUERIES["paragraph_dedup_stats"](spark, SF))
    # round-5: DSIR keeps the corpus side un-reshuffled — the
    # O(buckets) weight table must broadcast onto the doc-bucket counts
    ok &= audit("query: dsir_importance (broadcast weight model)",
                QUERIES["dsir_importance"](spark, SF), expect_broadcast=True)
    # (plan is the post-cache projection over the shared verified-pair
    # table — audited property is the equi-join shape, not the Arrow
    # stages, which live in the pair pipeline audited above)
    ok &= audit_no_bnlj("query: dedup_incremental_batch (new-shard projection)",
                        QUERIES["dedup_incremental_batch"](spark, SF))

    with open(OUT, "w") as f:
        f.write("# EXPLAIN — physical-plan audit\n\n")
        f.write("Generated by tools/explain_audit.py (rerunnable). Audited "
                "properties per SURVEY §4: pushdown/pruning reach the scans, "
                "Python appears ONLY as the two Arrow mapInPandas stages, "
                "dimension joins broadcast, JVM stages run under "
                "whole-stage codegen.\n\n")
        for name, plan, notes in sections:
            f.write(f"## {name}\n\n")
            for n in notes:
                f.write(f"- {n}\n")
            f.write("\n<details><summary>plan</summary>\n\n```\n")
            f.write(plan.strip()[:6000])
            f.write("\n```\n</details>\n\n")
    print(f"{'ALL OK' if ok else 'VIOLATIONS FOUND'} -> {OUT}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
