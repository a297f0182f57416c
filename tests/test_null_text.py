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


def test_events_user_paths_skips_untyped_events(ray_session, tmp_path):
    """NULL event_type contributes no path segment (the oracle's
    WHERE event_type IS NOT NULL) instead of crashing the '>'-join."""
    import numpy as np

    from engine.queries import events_user_paths

    n = 12
    tbl = pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array(np.arange(n).astype("datetime64[s]")
                       .astype("datetime64[us]")),
        "user_id": pa.array([i % 2 for i in range(n)], pa.int64()),
        "event_type": pa.array(
            [None if i == 0 else "t%d" % (i % 3) for i in range(n)],
            pa.string()),
        "value": pa.array([float(i) for i in range(n)], pa.float64()),
        "props": pa.array(["{}"] * n, pa.string())})
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    out = events_user_paths(str(tmp_path))
    assert len(out) == 2
    # user 0's first event is untyped -> path starts at the 2nd event
    assert out.loc[out["user_id"] == 0, "path"].iloc[0].startswith("t2")


def test_flagship_survives_null_transcript_text(ray_session, tmp_path):
    """A NULL transcript turn is an empty turn (no mentions), not a
    dead KgTurnProcessor stage; the run must also stay resumable
    (second run resumes every bucket with the same count)."""
    import glob

    from engine.pipeline import run_kg_pipeline
    from engine.synth import make_transcripts

    t = os.path.join(str(tmp_path), "t")
    make_transcripts(t, 8, 3)
    f = glob.glob(os.path.join(t, "*.parquet"))[0]
    tbl = pq.read_table(f)
    txt = tbl["text"].to_pylist()
    txt[0] = None
    txt[3] = None
    tbl = tbl.set_column(tbl.column_names.index("text"), "text",
                         pa.array(txt, pa.string()))
    pq.write_table(tbl, f)

    out = os.path.join(str(tmp_path), "kg")
    r1 = run_kg_pipeline(t, out)
    r2 = run_kg_pipeline(t, out)
    assert r1["triples"] == r2["triples"] > 0
    assert r2["resumed_buckets"]


def test_matrix_refuses_ragged_and_null_embeddings():
    """A ragged list column whose total length still divides n would
    reshape cleanly and silently shift every later vector — _matrix
    must raise instead (null rows are zero-width and caught too)."""
    import numpy as np

    from engine.simsearch import _matrix

    ok = _matrix(pa.array([[1.0, 2.0], [3.0, 4.0]],
                          pa.list_(pa.float32())))
    assert ok.shape == (2, 2)
    ragged = pa.array([[1.0], [2.0, 3.0, 4.0], [5.0, 6.0], [7.0, 8.0]],
                      pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="ragged"):
        _matrix(ragged)
    nulled = pa.array([[1.0, 2.0], None, [3.0, 4.0]],
                      pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="ragged"):
        _matrix(nulled)
