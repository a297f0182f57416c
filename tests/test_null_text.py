"""Null-text policy: documents.text NULLs become empty docs at the
single read choke point (engine/queries._rp), so every text operator
streams a 100-TB corpus with missing text instead of dying on the
first NaN in a pandas .str kernel. Before the fix, 7 of the doc
operators crashed on one synthetic null."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def null_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulldocs")
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["the quick brown fox", None, "",
                          "alpha beta alpha beta alpha"], pa.string()),
        "lang": pa.array(["en", "en", "de", "de"]),
        "source": pa.array(["a", "a", "b", "b"]),
        "n_chars": pa.array([19, 0, 0, 27], pa.int64())})
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", [
    "lang_id_docs", "token_count_docs", "quality_filter_docs",
    "docs_token_entropy", "rep_trigram_docs", "dedup_exact_docs",
    "redact_docs", "doc_stats_by_lang", "minhash_dup_clusters",
    "simhash_docs", "tfidf_doc_score", "docs_unigram_logprob",
    "fingerprint_docs",
])
def test_text_operators_survive_null_text(ray_session, null_docs_dir,
                                          name):
    from engine.queries import QUERIES

    r = QUERIES[name](null_docs_dir)
    r = r.to_pandas() if hasattr(r, "to_pandas") else r
    assert len(r) >= 1


def test_null_means_empty_doc(ray_session, null_docs_dir):
    """The policy is NULL == "": exact dedup must hash the null doc
    and the empty doc identically (one survivor for the pair), and
    per-doc outputs keep all four rows."""
    from engine.queries import QUERIES

    dd = QUERIES["dedup_exact_docs"](null_docs_dir)
    dd = dd.to_pandas() if hasattr(dd, "to_pandas") else dd
    assert len(dd) == 3  # docs 2 (null) and 3 ("") collapse

    red = QUERIES["redact_docs"](null_docs_dir)
    red = red.to_pandas() if hasattr(red, "to_pandas") else red
    assert list(red["doc_id"]) == [1, 2, 3, 4]
    assert red.loc[red["doc_id"] == 2, "red_text"].iloc[0] == ""
