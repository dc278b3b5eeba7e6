"""Corpus-level exact substring dedup (Lee et al. 2021 ExactSubstr,
VERDICT r4 #4): planted shared blocks are spliced out byte-exactly,
verified against an independent brute-force python reference AND the
DuckDB oracle."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from codedup.queries import (ORACLES, SUBSTR_K, substring_dedup_apply_frame)


def brute_splice(texts: dict[int, str], k: int = SUBSTR_K) -> dict[int, str]:
    """Independent reference: positions covered by any k-gram that
    occurs in >= 2 distinct docs are removed; coalescing falls out of
    per-position marking."""
    gram_docs: dict[str, set[int]] = {}
    for d, t in texts.items():
        if t is None:
            continue
        for i in range(len(t) - k + 1):
            gram_docs.setdefault(t[i:i + k], set()).add(d)
    out = {}
    for d, t in texts.items():
        if t is None:
            out[d] = None
            continue
        covered = [False] * len(t)
        for i in range(len(t) - k + 1):
            if len(gram_docs[t[i:i + k]]) >= 2:
                for j in range(i, i + k):
                    covered[j] = True
        out[d] = "".join(c for c, cv in zip(t, covered) if not cv)
    return out


def _docs_df(spark, texts: dict[int, str]):
    rows = [(d, "en", t) for d, t in sorted(texts.items())]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


SHARED = "LICENSED UNDER THE APACHE LICENSE VERSION 2.0 SEE NOTICE FILE"


CORPORA = {
    "shared_block": {
        0: "alpha module one " * 3 + SHARED + " trailer zero unique here",
        1: "totally different beta " + SHARED + " and another ending two",
        2: "this document shares nothing with the others at all, promise",
    },
    "two_blocks_one_doc": {  # two separate shared runs in doc 0
        0: SHARED + " middle part only in zero " + SHARED[::-1],
        1: SHARED + " completely different continuation text",
        2: "padding so reversed block also duplicates " + SHARED[::-1],
    },
    "adjacent_runs_coalesce": {  # doc 0 = A-block + B-block back-to-back
        0: "x" * 5 + SHARED + SHARED.lower() + "y" * 5,
        1: "first sharer context " + SHARED + " tail one",
        2: "second sharer context " + SHARED.lower() + " tail two",
    },
    "whole_doc_removed": {
        0: SHARED,
        1: "prefix " + SHARED + " suffix",
        2: "unrelated filler text long enough to exceed the gram size",
    },
    "short_and_null": {
        0: "tiny",                      # < k: no grams, kept whole
        1: None,                       # NULL text row survives as NULL
        2: "long enough unique text that must stay entirely untouched!",
        3: "another long enough unique text that also stays untouched",
    },
    "within_doc_repeat_not_removed": {  # repeat INSIDE one doc only
        0: SHARED + " bridge " + SHARED,
        1: "no shared content here, just a sufficiently long filler doc",
    },
}


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_frame_matches_brute_force(spark, name):
    texts = CORPORA[name]
    want = brute_splice(texts)
    got = {
        r.doc_id: r.new_text
        for r in substring_dedup_apply_frame(_docs_df(spark, texts)).collect()
    }
    assert got == want, name
    # stats consistency: removed = orig - len(new_text)
    for r in substring_dedup_apply_frame(_docs_df(spark, texts)).collect():
        if r.new_text is not None:
            assert r.orig_len - r.removed_chars == len(r.new_text)


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_query_matches_duckdb_oracle(spark, tmp_path, name):
    from codedup.queries import q_substring_dedup_apply

    texts = CORPORA[name]
    d = str(tmp_path)
    _docs_df(spark, texts).coalesce(1).write.mode("overwrite") \
        .parquet(d + "/documents.parquet")
    got = sorted(tuple(str(v) for v in r)
                 for r in q_substring_dedup_apply(spark, d).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    want = sorted(tuple(str(v) for v in r) for r in
                  con.execute(ORACLES["substring_dedup_apply"]).fetchall())
    assert got == want, name


def test_sha_pins_the_splice(spark):
    """The emitted sha256 is the hash of the brute-force spliced text —
    the oracle row verifies the REMOVAL, not just counts."""
    from pyspark.sql import functions as F

    texts = CORPORA["shared_block"]
    want = brute_splice(texts)
    out = substring_dedup_apply_frame(_docs_df(spark, texts)) \
        .select("doc_id", F.sha2("new_text", 256).alias("sha")).collect()
    for r in out:
        assert r.sha == hashlib.sha256(want[r.doc_id].encode()).hexdigest()
