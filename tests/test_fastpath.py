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
    from engine.colresolve import unpack_entries

    entries = [e for p in out["payload"].to_pylist()
               for e in unpack_entries(p)]
    assert sorted((e[0], e[1]) for e in entries) == [("c1", 0), ("c2", 0)]
    for e in entries:
        assert e[3]  # mentions present


def _entries_via_packs(texts, conv_ids, turn_idxs, num_buckets=4):
    batch = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "text": pa.array(texts, pa.string()),
    })
    return extract_packs(BatchKgExtractor(), batch, num_buckets)


def test_columnar_pack_roundtrip():
    """pack_entries -> unpack_entries must be the identity on the entry
    tuples, including separator-bearing conv ids (the escape hatch)."""
    from engine.colresolve import pack_entries, unpack_entries

    tbl = make_transcripts_local(60)
    texts = tbl["text"].to_pylist() + EDGE_TEXTS
    conv = tbl["conv_id"].to_pylist() + [f"e\x1fdge-{i}" for i in
                                         range(len(EDGE_TEXTS))]
    res = BatchKgExtractor().extract(texts)
    entries = [(c, i, 1000 + i, m, r)
               for i, (c, (m, r)) in enumerate(zip(conv, res)) if m]
    assert unpack_entries(pack_entries(entries)) == entries


def test_columnar_resolve_matches_reference_walk():
    """The columnar bucket resolver must produce tables EQUAL to the
    reference tuple walk (kgflow.resolve_entries + from_pylist) for
    both emits, across multiple payloads per bucket and edge texts."""
    from engine.colresolve import MAGIC, resolve_payloads, unpack_entries
    from engine.kgflow import resolve_entries
    from engine.pipeline import _ENTITY_SCHEMA
    from engine.schema import TRIPLES

    tbl = make_transcripts_local(300)
    texts = tbl["text"].to_pylist()
    conv = tbl["conv_id"].to_pylist()
    tix = tbl["turn_idx"].to_pylist()
    payloads = []
    for k in range(0, len(texts), 1000):  # several payloads per bucket
        out = _entries_via_packs(texts[k:k + 1000], conv[k:k + 1000],
                                 tix[k:k + 1000], num_buckets=1)
        payloads.extend(out["payload"].to_pylist())
    assert payloads and all(p.startswith(MAGIC) for p in payloads)

    entries = [e for p in payloads for e in unpack_entries(p)]
    entries.sort()
    for emit in ("triples", "entities"):
        ents, tris = resolve_entries(entries,
                                     emit_entities=emit == "entities")
        want = pa.Table.from_pylist(
            ents if emit == "entities" else tris,
            schema=_ENTITY_SCHEMA if emit == "entities" else TRIPLES)
        got = resolve_payloads(payloads, emit, _ENTITY_SCHEMA, TRIPLES)
        assert got.equals(want), emit


def test_resolve_bucket_legacy_payload_compat():
    """_resolve_bucket must accept v1 (pickled-tuples) payloads and
    mixed v1/v2 groups — the compatibility walk — with output equal to
    the all-v2 fast path."""
    import pickle
    import zlib

    from engine.colresolve import unpack_entries
    from engine.pipeline import _resolve_bucket

    tbl = make_transcripts_local(40)
    out = _entries_via_packs(tbl["text"].to_pylist(),
                             tbl["conv_id"].to_pylist(),
                             tbl["turn_idx"].to_pylist(), num_buckets=1)
    v2 = out["payload"].to_pylist()
    entries_per = [unpack_entries(p) for p in v2]
    v1 = [zlib.compress(pickle.dumps(e, protocol=5), 1)
          for e in entries_per]

    def grp(payloads):
        return pa.table({
            "bucket": pa.array([0] * len(payloads), pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
        })

    fast = _resolve_bucket(grp(v2), "triples")
    assert fast.num_rows > 0
    assert _resolve_bucket(grp(v1), "triples").equals(fast)
    assert _resolve_bucket(grp([v2[0]] + v1[1:]), "triples").equals(fast)


def test_columnar_resolve_empty_and_relfree():
    """Edge shapes: a payload whose entries have mentions but no
    relations must yield an empty triples table with the right schema
    (and a non-empty entities table)."""
    from engine.colresolve import resolve_payloads
    from engine.pipeline import _ENTITY_SCHEMA
    from engine.schema import TRIPLES

    out = _entries_via_packs(["Alice .", "Bob ."], ["c1", "c2"], [0, 0],
                             num_buckets=1)
    payloads = out["payload"].to_pylist()
    tris = resolve_payloads(payloads, "triples", _ENTITY_SCHEMA, TRIPLES)
    assert tris.num_rows == 0 and tris.schema.equals(TRIPLES)
    ents = resolve_payloads(payloads, "entities", _ENTITY_SCHEMA, TRIPLES)
    assert ents.num_rows == 2 and ents.schema.equals(_ENTITY_SCHEMA)


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
