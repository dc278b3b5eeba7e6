"""paragraph_dedup_apply: the CCNet/RefinedWeb sub-document dedup
transform — corpus-duplicated paragraphs are removed under the
keep-first-doc policy, and the cleaned text is exactly reconstructable
(not just counted).  A planted mini-corpus pins the semantics
paragraph by paragraph."""

from __future__ import annotations

import pandas as pd
import pytest

from codedup.queries import paragraph_dedup_apply_frame

BOILER = "Licensed under the Apache License."
INTRO = "This module frobnicates."
BODY_A = "def f():\n    return 1"
BODY_B = "def g():\n    return 2"
UNIQUE_C = "Completely original closing thought."


@pytest.fixture(scope="module")
def planted(spark):
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            # doc 1 owns BOILER and INTRO (lowest doc_id containing them)
            f"{BOILER}\n\n{INTRO}\n\n{BODY_A}",
            # doc 2 repeats BOILER (dropped) + its own body (kept)
            f"{BOILER}\n\n{BODY_B}",
            # doc 3 repeats BOILER and INTRO (both dropped) + unique (kept)
            f"{BOILER}\n\n{INTRO}\n\n{UNIQUE_C}",
            # doc 4: no duplicated paragraphs at all
            "Standalone paragraph one.\n\n\nStandalone paragraph two.",
        ],
    })
    out = paragraph_dedup_apply_frame(
        spark.createDataFrame(docs)).toPandas().set_index("doc_id").sort_index()
    return out


def test_owner_doc_keeps_everything(planted):
    r = planted.loc[1]
    assert (r.n_paras, r.n_kept) == (3, 3)
    assert r.new_text == f"{BOILER}\n\n{INTRO}\n\n{BODY_A}"


def test_duplicated_paragraphs_dropped_in_later_docs(planted):
    r2 = planted.loc[2]
    assert (r2.n_paras, r2.n_kept) == (2, 1)
    assert r2.new_text == BODY_B
    r3 = planted.loc[3]
    assert (r3.n_paras, r3.n_kept) == (3, 1)
    assert r3.new_text == UNIQUE_C


def test_untouched_doc_is_renormalized_join(planted):
    # >=2-newline runs are ONE separator; cleaned text re-joins with a
    # single blank line (the normalized CCNet output form)
    r = planted.loc[4]
    assert (r.n_paras, r.n_kept) == (2, 2)
    assert r.new_text == "Standalone paragraph one.\n\nStandalone paragraph two."


def test_empty_and_whitespace_docs_covered(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10, 11], "text": ["", "   \n\n   "]}))
    out = paragraph_dedup_apply_frame(docs).toPandas().set_index("doc_id")
    assert set(out.index) == {10, 11}
    assert (out.n_paras == 0).all() and (out.n_kept == 0).all()
    assert (out.new_text == "").all()


def test_intra_doc_repeat_stays_with_owner(spark):
    """A paragraph repeated INSIDE one doc only is intra-doc repetition
    (doc_repetition_stats' job) — the cross-doc policy keeps both
    occurrences in the owner."""
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": [f"{BOILER}\n\n{BOILER}", f"{BOILER}\n\nTail."],
    }))
    out = paragraph_dedup_apply_frame(docs).toPandas().set_index("doc_id")
    assert out.loc[1].new_text == f"{BOILER}\n\n{BOILER}"
    assert out.loc[2].new_text == "Tail."
