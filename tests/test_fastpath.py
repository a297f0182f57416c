"""Literal-equality proof for the vectorized flagship turn chain:
engine.fastpath.BatchKgExtractor must produce EXACTLY the (mentions,
relations) of the SentenceProcessor reference path (the one the
single-process oracle runs), for every turn, under any batching."""

from __future__ import annotations

import pyarrow as pa

from engine.fastpath import BatchKgExtractor, extract_packs, token_md_morphs
from engine.kgflow import (SentenceProcessor, kg_mentions,
                          relation_candidates)
from engine.ops.lattice import build_sentence_lattice, md_select, prune_lattice
from engine.scorers import TokenMultiScorer
from engine.synth import make_transcripts_local

EDGE_TEXTS = [
    "", "   ", "???", "'", "abc'", "'abc", "be'", "ha'", "mi'ha'Acme",
    "ha'Acme works at be'Tel Aviv .",
    "xa'Paris met mi'Paris",
    "be'le'Alice Cohen visited ve'xa'New York",
    "she'Dylan and ha'Stark attended le'World Cup .",
    "Alice Alice met Alice",
    "Tony Stark worked at Stark Industries located in New York",
    "x \x00 sentinel-collision text with Alice",
    "x \x1f unit-sep text with Alice met Bob",
    "1024 Alice met 2019 Bob",
    "Alice be'met Bob",  # fused non-entity token in a relation gap
    "The Odyssey acquired Dead Sea",
    "did be'Noa really traveled to ve'Haifa ?",
    "Tel be'Aviv met Alice",  # fused token INSIDE a multi-word alias
    "be'Tel Aviv met ha'New York",
]


def _reference(texts):
    sp = SentenceProcessor()
    out = []
    for tx in texts:
        rec = sp.process(tx, levels=("morph_hybrid", "multi_align"))
        m = kg_mentions(rec)
        out.append((m, relation_candidates(rec["morph_forms"], m)))
    return out


def test_fastpath_matches_reference_chain():
    texts = make_transcripts_local(150)["text"].to_pylist() + EDGE_TEXTS
    ref = _reference(texts)
    got = BatchKgExtractor().extract(texts)
    assert got == ref


def test_fastpath_batching_invariance():
    texts = make_transcripts_local(60)["text"].to_pylist() + EDGE_TEXTS
    whole = BatchKgExtractor().extract(texts)
    ex = BatchKgExtractor()  # one extractor fed uneven chunks
    chunked = []
    for k in range(0, len(texts), 37):
        chunked.extend(ex.extract(texts[k:k + 37]))
    assert chunked == whole


def test_token_md_morphs_matches_lattice_chain():
    multi = TokenMultiScorer()
    toks = ["Paris", "be'Paris", "xa'Paris", "mi'Paris", "ha'Acme",
            "be'le'Alice", "mi'ha'Acme", "be'", "'", "she'ha'x", "a'b'c"]
    labels = multi.label(toks)
    lat = build_sentence_lattice(toks)
    ref = md_select(prune_lattice(lat, labels))
    got = [(f, tid) for tid, t in enumerate(toks, start=1)
           for f in token_md_morphs(t)]
    assert got == ref


def test_extract_packs_drops_mention_free_turns():
    batch = pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "text": ["Alice met Bob", "no entities here .", "Dana visited Paris"],
    })
    out = extract_packs(BatchKgExtractor(), batch, num_buckets=8)
    import pickle
    import zlib

    entries = [e for p in out["payload"].to_pylist()
               for e in pickle.loads(zlib.decompress(p))]
    assert sorted((e[0], e[1]) for e in entries) == [("c1", 0), ("c2", 0)]
    for e in entries:
        assert e[3]  # mentions present


def test_batch_mention_extractor_matches_reference_all_levels():
    """VERDICT r3 #4: the vectorized MentionExtractor backend must equal
    scenario_mentions(SentenceProcessor.process(...)) literally, for all
    five scenario levels, on a corpus slice plus the edge texts."""
    from engine.fastpath import BatchMentionExtractor
    from engine.kgflow import SCENARIOS, scenario_mentions

    texts = make_transcripts_local(150)["text"].to_pylist() + EDGE_TEXTS
    sp = SentenceProcessor()
    ref = [scenario_mentions(sp.process(t, levels=SCENARIOS), SCENARIOS)
           for t in texts]
    got = BatchMentionExtractor(SCENARIOS).extract(texts)
    assert len(got) == len(ref)
    for g, r, t in zip(got, ref, texts):
        assert g == r, t


def test_batch_mention_extractor_level_subset():
    from engine.fastpath import BatchMentionExtractor
    from engine.kgflow import scenario_mentions

    levels = ("token_single", "morph_yap")
    texts = make_transcripts_local(40)["text"].to_pylist() + EDGE_TEXTS
    sp = SentenceProcessor()
    ref = [scenario_mentions(sp.process(t, levels=levels), levels)
           for t in texts]
    got = BatchMentionExtractor(levels).extract(texts)
    assert got == ref


def test_batch_dep_extractor_matches_reference():
    from engine.fastpath import BatchDepExtractor

    texts = make_transcripts_local(80)["text"].to_pylist() + EDGE_TEXTS
    sp = SentenceProcessor()
    got = BatchDepExtractor().extract(texts)
    for t, (forms, tids, dep) in zip(texts, got):
        rec = sp.process(t, levels=("morph_hybrid",), with_dep=True)
        assert forms == rec["morph_forms"], t
        assert tids == rec["morph_token_ids"], t
        assert dep == rec["dep_info"], t
