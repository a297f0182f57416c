"""NcrfScorer (engine/ncrf.py): the weight-loadable CRF slot.

Checks: embedding-file parse + match/OOV semantics
(utils/functions.py:162-218), exact Viterbi vs brute force, n-best
ordering + validity, batched length-sort/restore discipline, and the
actor-pool dataflow (encode -> pad -> decode -> BIOSE out) on a real
map_batches stage.
"""

import itertools

import numpy as np
import pandas as pd
import pytest


def _tiny_alphabet(words):
    from engine.vocab import Alphabet

    a = Alphabet("word")
    for w in words:
        a.add(w)
    return a


def test_embedding_file_parse_and_match(tmp_path):
    from engine.ncrf import build_pretrain_embedding, load_pretrain_emb

    p = tmp_path / "emb.txt"
    p.write_text(
        "alice 1.0 0.0\n"
        "bob 0.0 2.0\n"
        "broken 1.0 2.0 3.0\n"   # illegal line: skipped
        "carol 3.0 4.0\n"
    )
    d, dim = load_pretrain_emb(str(p))
    assert dim == 2 and set(d) == {"alice", "bob", "carol"}

    alpha = _tiny_alphabet(["alice", "Bob", "dave"])
    emb, dim2, stats = build_pretrain_embedding(str(p), alpha, seed=1)
    assert dim2 == 2
    # alphabet rows: alice (perfect), Bob (case via "bob"), dave (OOV),
    # plus the </unk> row which also draws an OOV vector
    assert stats == {"perfect_match": 1, "case_match": 1, "not_match": 2}
    # norm2one applied: matched rows are unit-norm
    i = alpha.get_index("alice")
    assert np.isclose(np.linalg.norm(emb[i]), 1.0)
    j = alpha.get_index("Bob")  # case-match via bob
    assert np.isclose(np.linalg.norm(emb[j]), 1.0)
    # padding row stays zero
    assert np.allclose(emb[0], 0.0)


def test_viterbi_matches_bruteforce():
    from engine.ncrf import biose_tagset, constrained_transitions, viterbi_batch

    rng = np.random.default_rng(3)
    tags = biose_tagset(("PER", "ORG"))
    T = constrained_transitions(tags)
    n = len(tags)
    for L in (1, 2, 4, 5):
        feats = rng.standard_normal((1, L, n))
        got = viterbi_batch(feats, np.array([L]), T)[0]
        # brute force over all valid paths
        best, best_path = -np.inf, None
        for path in itertools.product(range(n), repeat=L):
            s = T[n, path[0]] + feats[0, 0, path[0]]
            for t in range(1, L):
                s += T[path[t - 1], path[t]] + feats[0, t, path[t]]
            s += T[path[-1], n + 1]
            if s > best:
                best, best_path = s, list(path)
        assert got == best_path, (L, got, best_path)


def test_viterbi_nbest_ordering_and_validity():
    from engine.ncrf import (biose_tagset, constrained_transitions,
                             viterbi_nbest)
    from engine.ops.labels import validate_biose_sequence

    rng = np.random.default_rng(5)
    tags = biose_tagset(("PER",))
    T = constrained_transitions(tags)
    feats = rng.standard_normal((4, len(tags)))
    out = viterbi_nbest(feats, 4, T, nbest=5)
    assert len(out) == 5
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    assert len({tuple(p) for p, _ in out}) == 5  # distinct paths
    for path, _ in out:
        labels = [tags[j] for j in path]
        assert validate_biose_sequence(labels), labels


def test_scorer_batch_restores_order_and_is_deterministic():
    from engine.ncrf import NcrfScorer

    alpha = _tiny_alphabet(["Alice", "met", "Bob", "in", "Paris", "today"])
    sc = NcrfScorer(word_alphabet=alpha, embedd_dim=8, seed=11)
    sents = [
        ["Alice", "met", "Bob"],
        ["Paris"],
        ["Alice", "met", "Bob", "in", "Paris", "today"],
        [],
    ]
    out = sc.label_batch([s for s in sents if s])
    assert [len(o) for o in out] == [3, 1, 6]  # original order, not sorted
    # per-sentence decode identical to batched decode (padding must not
    # leak into shorter sequences)
    for s, o in zip([s for s in sents if s], out):
        assert sc.label(s) == o
    sc2 = NcrfScorer(word_alphabet=_tiny_alphabet(
        ["Alice", "met", "Bob", "in", "Paris", "today"]), embedd_dim=8, seed=11)
    assert sc2.label_batch([["Alice", "met", "Bob"]]) == out[:1]


def test_scorer_nbest_head_is_viterbi():
    from engine.ncrf import NcrfScorer

    alpha = _tiny_alphabet(["Alice", "met", "Bob"])
    sc = NcrfScorer(word_alphabet=alpha, embedd_dim=8, seed=11)
    toks = ["Alice", "met", "Bob"]
    nb = sc.label_nbest(toks, n=3)
    assert nb[0][0] == sc.label(toks)
    assert nb[0][1] >= nb[-1][1]


def test_scorer_on_actor_pool(ray_session):
    """The actor-pool dataflow the reference runs its models on
    (api_main.py:53-80 model registry -> batched decode): scorer built
    once per actor in __init__, token-list column in, BIOSE column out."""
    import ray.data as rd

    from engine.ncrf import NcrfStage

    rows = [
        {"sent_id": i, "tokens": ["Alice", "met", "Bob"] if i % 2 == 0
         else ["Bob", "visited", "Paris", "in"]}
        for i in range(64)
    ]
    out = (
        rd.from_items(rows)
        .map_batches(
            NcrfStage,
            fn_constructor_kwargs={
                "words": ["Alice", "met", "Bob", "in", "Paris", "visited"],
                "embedd_dim": 8, "seed": 11},
            batch_format="pandas", concurrency=2, batch_size=16)
        .to_pandas()
        .sort_values("sent_id")
    )
    assert len(out) == 64
    lens = out["labels"].map(len).tolist()
    toks = out["tokens"].map(len).tolist()
    assert lens == toks  # one BIOSE tag per token, order preserved
    # deterministic across the two actor replicas: identical inputs ->
    # identical labels
    even = {tuple(l) for l in out[out.sent_id % 2 == 0]["labels"]}
    odd = {tuple(l) for l in out[out.sent_id % 2 == 1]["labels"]}
    assert len(even) == 1 and len(odd) == 1


def test_char_featurizer_matrix_and_ngram_signal():
    """CharCNN analog (model/charcnn.py:12-74 semantics): hashed char
    n-gram embeddings, max-pooled per word. Shared n-grams pull word
    vectors together; the padding row stays zero; building twice with
    one seed is byte-identical."""
    from engine.ncrf import CharNgramFeaturizer

    f1 = CharNgramFeaturizer(char_dim=16, seed=13)
    f2 = CharNgramFeaturizer(char_dim=16, seed=13)
    alpha = _tiny_alphabet(["walking", "walked", "Paris"])
    m1, m2 = f1.matrix(alpha), f2.matrix(alpha)
    assert m1.shape == (alpha.size(), 16)
    assert np.array_equal(m1, m2)
    assert np.allclose(m1[0], 0.0)  # padding row

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    va = f1.word_vec("walking")
    vb = f1.word_vec("walked")   # shares <wa, wal, alk n-grams
    vc = f1.word_vec("Paris")    # disjoint n-grams
    assert cos(va, vb) > cos(va, vc)


def test_scorer_char_features_deterministic_and_consistent():
    """use_char widens the embedding matrix (word ⊕ char rows) without
    touching the CRF: decode stays valid BIOSE, batch == single-decode,
    replicas built from the same config are identical, and the char
    signal actually changes the emissions vs the word-only scorer."""
    from engine.ncrf import NcrfScorer
    from engine.ops.labels import validate_biose_sequence

    words = ["Alice", "met", "Bob", "in", "Paris"]
    sc = NcrfScorer(word_alphabet=_tiny_alphabet(words), embedd_dim=8,
                    seed=11, use_char=True, char_dim=8)
    sc2 = NcrfScorer(word_alphabet=_tiny_alphabet(words), embedd_dim=8,
                     seed=11, use_char=True, char_dim=8)
    base = NcrfScorer(word_alphabet=_tiny_alphabet(words), embedd_dim=8,
                      seed=11)
    assert sc.emb.shape[1] == 16 and base.emb.shape[1] == 8
    sents = [["Alice", "met", "Bob"], ["Paris"],
             ["Bob", "in", "Paris", "met", "Alice"]]
    out = sc.label_batch(sents)
    assert out == sc2.label_batch(sents)
    for s, o in zip(sents, out):
        assert len(o) == len(s)
        assert validate_biose_sequence(o) is not None
        assert sc.label(s) == o
    # char rows are part of the feature map: emissions differ from the
    # word-only scorer's (same word seed, wider W)
    ids, lengths = sc._encode_pad([sents[0]])
    mask = (np.arange(ids.shape[1])[None, :] < lengths[:, None]).astype(float)
    assert not np.allclose(sc.emissions(ids, mask), base.emissions(ids, mask))


def test_feature_column_surface():
    """[POS]word extra-feature surface (utils/data.py:187-213): a
    closed feature alphabet embeds per-token feature strings into the
    emission input; unseen values fall back to </unk>; supplying
    features changes emissions; decode shape is preserved."""
    from engine.ncrf import FeatureEmbedder, NcrfScorer

    fe = FeatureEmbedder(["[POS]NOUN", "[POS]VERB"], feat_dim=4, seed=17)
    enc = fe.encode_pad([["[POS]NOUN", "[POS]XYZ"]], 3)
    assert enc[0, 0] == fe.alpha.get_index("[POS]NOUN")
    assert enc[0, 1] == fe.alpha.get_index("</unk>")  # unseen value
    assert enc[0, 2] == 0  # padding
    feats = fe.features([["[POS]NOUN", "[POS]XYZ"]], 3)
    assert feats.shape == (1, 3, 4)
    assert np.allclose(feats[0, 2], 0.0)  # padding row zero

    words = ["Alice", "met", "Bob"]
    sc = NcrfScorer(word_alphabet=_tiny_alphabet(words), embedd_dim=8,
                    seed=11, feature_values=["[POS]NOUN", "[POS]VERB"],
                    feat_dim=4)
    toks = ["Alice", "met", "Bob"]
    fn = ["[POS]NOUN", "[POS]VERB", "[POS]NOUN"]
    fv = ["[POS]VERB", "[POS]NOUN", "[POS]VERB"]
    out_n = sc.label(toks, features=fn)
    out_v = sc.label(toks, features=fv)
    assert len(out_n) == len(toks) and len(out_v) == len(toks)
    ids, lengths = sc._encode_pad([toks])
    mask = (np.arange(ids.shape[1])[None, :] < lengths[:, None]).astype(float)
    en = sc.emissions(ids, mask, sc.featurizer.features([fn], ids.shape[1]))
    ev = sc.emissions(ids, mask, sc.featurizer.features([fv], ids.shape[1]))
    assert not np.allclose(en, ev)
    # batch path consistent with the single-sequence path
    assert sc.label_batch([toks, toks], [fn, fv]) == [out_n, out_v]


def test_ncrf_stage_char_and_features_col(ray_session):
    """Actor-pool stage with use_char + a features column: one label
    per token, deterministic across replicas."""
    import ray.data as rd

    from engine.ncrf import NcrfStage

    rows = [
        {"sent_id": i, "tokens": ["Alice", "met", "Bob"],
         "feats": ["[POS]NOUN", "[POS]VERB", "[POS]NOUN"]}
        for i in range(32)
    ]
    out = (
        rd.from_items(rows)
        .map_batches(
            NcrfStage,
            fn_constructor_kwargs={
                "words": ["Alice", "met", "Bob"], "embedd_dim": 8,
                "seed": 11, "use_char": True, "char_dim": 8,
                "feature_values": ["[POS]NOUN", "[POS]VERB"],
                "features_col": "feats"},
            batch_format="pandas", concurrency=2, batch_size=8)
        .to_pandas()
        .sort_values("sent_id")
    )
    assert len(out) == 32
    assert all(len(l) == 3 for l in out["labels"])
    assert len({tuple(l) for l in out["labels"]}) == 1
