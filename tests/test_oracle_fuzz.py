"""Cross-engine fuzz: hypothesis-generated corpora must satisfy
Spark == DuckDB for the text-hygiene queries.  This is where oracle
divergences actually live (unicode whitespace classes, empty docs,
regex semantics, NULL-vs-'' aggregation edges) — the sf corpora are too
tame to hit them.  derandomize=True keeps the suite deterministic;
example counts are small because each example pays a Spark job.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from codedup.queries import ORACLES, QUERIES

# printable-ish text incl. newlines/tabs/punctuation/accents; no
# surrogates (unencodable), no NUL (parquet/duckdb string edge we do
# not promise)
_CHARS = st.characters(
    blacklist_categories=("Cs",), blacklist_characters="\x00", max_codepoint=0x2FFF)
_TEXTS = st.lists(st.text(alphabet=_CHARS, max_size=80), min_size=1, max_size=6)

_FUZZED = ["doc_repetition_stats", "paragraph_dedup_stats", "doc_pii_scrub",
           "text_stats", "dedup_minhash_lsh_tokens", "doc_winnowing",
           "winnowing_pairs", "simhash_tokens", "lang_id_heuristic",
           "doc_category_rules", "doc_minhash_fingerprint",
           "dedup_ngram_jaccard", "dedup_containment", "doc_rarest_terms",
           "bpe_token_stats"]

_SETTINGS = settings(
    max_examples=4, deadline=None, derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)


def _write_corpus(spark, d: str, texts: list[str]) -> None:
    rows = [(i, "en", t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, lang string, text string") \
        .coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(sql).fetchdf()


def _norm(rows):
    return sorted(tuple(str(v) for v in r) for r in rows)


@pytest.mark.parametrize("qname", _FUZZED)
def test_fuzz_engine_equals_oracle(spark, tmp_path_factory, qname):
    run = [0]

    @_SETTINGS
    @given(_TEXTS)
    def inner(texts):
        run[0] += 1
        d = str(tmp_path_factory.mktemp(f"fuzz_{qname}_{run[0]}"))
        _write_corpus(spark, d, texts)
        got = _norm([tuple(r) for r in QUERIES[qname](spark, d).collect()])
        want = _norm([tuple(r) for r in
                      _oracle(d, ORACLES[qname]).itertuples(index=False)])
        assert got == want, f"{qname} diverged on {texts!r}"

    inner()
