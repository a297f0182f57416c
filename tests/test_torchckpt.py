"""Pure-numpy NCRF++ checkpoint path (VERDICT r4 #5): torch-zip
save/load round trip without torch, the numpy WordRep/CharCNN/BiLSTM
forward, and the checkpoint-driven scorer behind the emission slot."""

from __future__ import annotations

import math
import zipfile

import numpy as np
import pytest

from engine.ncrf import (NcrfCheckpointEmissions, NcrfScorer,
                         char_cnn_features, lstm_forward,
                         ncrf_label_ids, remap_checkpoint_crf)
from engine.torchckpt import load_state_dict, save_state_dict
from engine.vocab import Alphabet


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    state = {
        "a.weight": rng.standard_normal((7, 3)).astype(np.float32),
        "b.bias": rng.standard_normal(4).astype(np.float64),
        "c.ids": np.arange(6, dtype=np.int64).reshape(2, 3),
        "d.flag": np.array([True, False]),
        "e.scalar": np.float32(2.5).reshape(()),
    }
    p = str(tmp_path / "model.0.model")
    save_state_dict(p, state)
    # the file is a proper zip with the torch.save member layout
    with zipfile.ZipFile(p) as zf:
        names = zf.namelist()
    assert "archive/data.pkl" in names and "archive/version" in names
    got = load_state_dict(p)
    assert set(got) == set(state)
    for k in state:
        assert got[k].dtype == np.asarray(state[k]).dtype, k
        np.testing.assert_array_equal(got[k], state[k])


def test_checkpoint_loader_rejects_garbage(tmp_path):
    p = tmp_path / "bad.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("whatever.txt", "nope")
    with pytest.raises(ValueError, match="data.pkl"):
        load_state_dict(str(p))
    # a pickle referencing a non-torch global (os.system here) must be
    # refused by find_class, not resolved and executed
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", b"\x80\x02cos\nsystem\nq\x00.")
        zf.writestr("archive/version", "3\n")
    with pytest.raises(Exception, match="disallowed|global"):
        load_state_dict(str(p))


def test_lstm_forward_single_step_closed_form():
    """One step, H=1, all weights crafted so gates are hand-computable:
    x=1, zero hidden -> i=s(wi), f irrelevant (c=0 start), g=tanh(wg),
    o=s(wo); h = o * tanh(i*g)."""
    wi, wf, wg, wo = 0.5, -0.3, 0.8, 0.2
    w_ih = np.array([[wi], [wf], [wg], [wo]])
    w_hh = np.zeros((4, 1))
    b = np.zeros(4)
    x = np.ones((1, 1, 1))
    out = lstm_forward(x, np.array([1]), w_ih, w_hh, b, b)
    s = lambda v: 1 / (1 + math.exp(-v))  # noqa: E731
    want = s(wo) * math.tanh(s(wi) * math.tanh(wg))
    assert abs(out[0, 0, 0] - want) < 1e-12


def test_lstm_forward_padding_semantics():
    """pack_padded_sequence semantics: outputs zero at padded
    positions, and BOTH directions over a padded batch equal the
    unpadded per-sequence run (padding never enters the recurrence)."""
    rng = np.random.default_rng(11)
    H, D = 3, 2
    w_ih = rng.standard_normal((4 * H, D))
    w_hh = rng.standard_normal((4 * H, H))
    b_ih = rng.standard_normal(4 * H)
    b_hh = rng.standard_normal(4 * H)
    x2 = rng.standard_normal((1, 2, D))       # true length 2
    xpad = np.zeros((1, 5, D))
    xpad[:, :2] = x2
    for rev in (False, True):
        ref = lstm_forward(x2, np.array([2]), w_ih, w_hh, b_ih, b_hh,
                           reverse=rev)
        got = lstm_forward(xpad, np.array([2]), w_ih, w_hh, b_ih, b_hh,
                           reverse=rev)
        np.testing.assert_allclose(got[:, :2], ref, atol=1e-12)
        assert np.all(got[:, 2:] == 0.0)


def test_char_cnn_degenerate_kernel_is_pointwise_max():
    """conv weight zero except the kernel center -> the CNN reduces to
    a per-position linear map, and the pool picks its max."""
    rng = np.random.default_rng(3)
    n_chars, d, hidden = 10, 4, 5
    emb = rng.standard_normal((n_chars, d))
    w_center = rng.standard_normal((hidden, d))
    conv_w = np.zeros((hidden, d, 3))
    conv_w[:, :, 1] = w_center
    bias = rng.standard_normal(hidden)
    ids = rng.integers(0, n_chars, (6, 7))
    got = char_cnn_features(ids, emb, conv_w, bias)
    want = (emb[ids] @ w_center.T + bias).max(axis=1)
    np.testing.assert_allclose(got, want, atol=1e-12)


def _synthetic_ncrf_state(word_alpha: Alphabet, char_alpha: Alphabet,
                          n_tags_aug: int, d_word=6, d_char=4,
                          char_hidden=5, lstm_hidden=4, seed=9):
    rng = np.random.default_rng(seed)
    in_dim = d_word + char_hidden
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)  # noqa: E731
    state = {
        "word_hidden.wordrep.word_embedding.weight":
            f32(word_alpha.size(), d_word),
        "word_hidden.wordrep.char_feature.char_embeddings.weight":
            f32(char_alpha.size(), d_char),
        "word_hidden.wordrep.char_feature.char_cnn.weight":
            f32(char_hidden, d_char, 3),
        "word_hidden.wordrep.char_feature.char_cnn.bias": f32(char_hidden),
        "word_hidden.hidden2tag.weight": f32(n_tags_aug, 2 * lstm_hidden),
        "word_hidden.hidden2tag.bias": f32(n_tags_aug),
        "crf.transitions": f32(n_tags_aug, n_tags_aug),
    }
    for sfx in ("", "_reverse"):
        state[f"word_hidden.lstm.weight_ih_l0{sfx}"] = f32(
            4 * lstm_hidden, in_dim)
        state[f"word_hidden.lstm.weight_hh_l0{sfx}"] = f32(
            4 * lstm_hidden, lstm_hidden)
        state[f"word_hidden.lstm.bias_ih_l0{sfx}"] = f32(4 * lstm_hidden)
        state[f"word_hidden.lstm.bias_hh_l0{sfx}"] = f32(4 * lstm_hidden)
    return state


def _alphabets(words):
    wa = Alphabet("word")
    ca = Alphabet("char")
    for w in words:
        wa.add(w)
        for ch in w:
            ca.add(ch)
    wa.close()
    ca.close()
    return wa, ca


def test_checkpoint_scorer_end_to_end(tmp_path):
    """A saved synthetic NCRF++ checkpoint drives NcrfScorer decode:
    deterministic, batch-invariant, valid BIOSE output, checkpoint CRF
    transitions used (remap sanity via the shape contract)."""
    words = ["Alice", "met", "Bob", "in", "Paris", "yesterday", "."]
    wa, ca = _alphabets(words)
    n_tags = len(NcrfScorer.CATEGORIES) * 4 + 1
    state = _synthetic_ncrf_state(wa, ca, n_tags_aug=n_tags + 1 + 2)
    p = str(tmp_path / "synth.model")
    save_state_dict(p, state)

    sc = NcrfScorer(word_alphabet=wa, checkpoint_path=p,
                    char_alphabet_json=ca.to_json())
    sents = [["Alice", "met", "Bob"],
             ["Paris", "."],
             ["Alice", "met", "Bob", "in", "Paris", "yesterday", "."]]
    batch = sc.label_batch(sents)
    assert [len(x) for x in batch] == [len(s) for s in sents]
    singles = [sc.label(s) for s in sents]
    assert batch == singles  # padding/length-sort invariance
    sc2 = NcrfScorer(word_alphabet=wa, checkpoint_path=p,
                     char_alphabet_json=ca.to_json())
    assert sc2.label_batch(sents) == batch  # replica determinism
    for labels in batch:
        for t in labels:
            assert t == "O" or (t[0] in "BIES" and t[1] == "-")


def test_checkpoint_emissions_mask_and_width(tmp_path):
    words = ["a", "bb", "ccc"]
    wa, ca = _alphabets(words)
    state = _synthetic_ncrf_state(wa, ca, n_tags_aug=8)
    em = NcrfCheckpointEmissions(state, wa, ca)
    ids = np.array([[1, 2, 0, 0], [1, 2, 3, 1]])
    mask = np.array([[1.0, 1, 0, 0], [1, 1, 1, 1]])
    out = em(ids, mask)
    assert out.shape == (2, 4, 8)
    assert np.all(out[0, 2:] == 0.0)  # masked positions zeroed


def test_remap_checkpoint_crf_gather():
    full = np.arange(36, dtype=np.float64).reshape(6, 6)  # 4 labels + 2
    ids = ncrf_label_ids(["X", "Y"])  # -> [1, 2]
    got = remap_checkpoint_crf(full, ids)
    sel = [1, 2, 4, 5]
    np.testing.assert_array_equal(got, full[np.ix_(sel, sel)])
