"""Distributed CRF trainer (A8 analog): exact-NLL training over the
linear-emission CRF must learn the deterministic gazetteer labeling
(engine/scorers.py) from data, and the trained weights must drop into
the unchanged inference path."""

import numpy as np
import pandas as pd
import ray.data as rd


def _labeled_corpus(n=120):
    from engine.ops.tokenize import tokenize
    from engine.scorers import TokenSingleScorer
    from engine.synth import make_transcripts_local

    t = make_transcripts_local(n_convs=20, seed=5)
    df = t.to_pandas().head(n)
    sc = TokenSingleScorer()
    df["tokens"] = [tokenize(x) for x in df["text"]]
    df["gold"] = [sc.label(tk) for tk in df["tokens"]]
    return df[["tokens", "gold"]]


def test_train_crf_learns_gazetteer(ray_session):
    from engine.train import train_crf, trained_scorer
    from engine.vocab import build_vocab

    df = _labeled_corpus()
    ds = rd.from_pandas(df)
    alpha = build_vocab(ds, "tokens")
    weights, hist = train_crf(ds, alpha.to_json(), epochs=12, embedd_dim=64)

    # epoch-0 row measures the zero init (majority-class decode);
    # training must push token accuracy far above it
    acc0 = hist["token_acc"].iloc[0]
    accN = hist["token_acc"].iloc[-1]
    assert accN > acc0 + 0.1, hist
    assert accN > 0.95, hist
    # convex objective + full-batch steps: NLL must come down
    assert hist["nll"].iloc[-1] < hist["nll"].iloc[0], hist

    # trained weights drop into the unchanged serving scorer and
    # reproduce the gold labels on training sentences
    sc = trained_scorer(alpha.to_json(), weights, embedd_dim=64)
    n_tok = n_err = 0
    for toks, gold in zip(df["tokens"].head(15), df["gold"].head(15)):
        out = sc.label(list(toks))
        assert len(out) == len(toks)
        n_tok += len(out)
        n_err += sum(a != g for a, g in zip(out, gold))
    assert 1.0 - n_err / n_tok > 0.9, (n_err, n_tok)


def test_train_history_partition_independent(ray_session):
    """Synchronous full-batch updates: every epoch sees the same
    corpus, so n_tokens is constant across epochs, and the history is
    identical when the same data arrives in a different partitioning
    (integer counters are summation-order-proof)."""
    from engine.train import train_crf
    from engine.vocab import build_vocab

    df = _labeled_corpus(n=60)
    alpha = build_vocab(rd.from_pandas(df), "tokens")
    _, h1 = train_crf(rd.from_pandas(df), alpha.to_json(), epochs=3,
                      embedd_dim=32)
    _, h2 = train_crf(rd.from_pandas(df).repartition(7), alpha.to_json(),
                      epochs=3, embedd_dim=32)
    assert h1["n_tokens"].nunique() == 1
    assert list(h1["epoch"]) == [0, 1, 2]
    pd.testing.assert_series_equal(h1["n_errors"], h2["n_errors"])


def test_train_char_features_roundtrip(ray_session):
    """use_char widens the trainable feature map (hashed char n-gram
    rows on the embedding matrix); the trained weights only fit a
    scorer built with the SAME char config."""
    from engine.train import train_crf, trained_scorer
    from engine.vocab import build_vocab

    df = _labeled_corpus(n=40)
    ds = rd.from_pandas(df)
    alpha = build_vocab(ds, "tokens")
    weights, hist = train_crf(ds, alpha.to_json(), epochs=3,
                              embedd_dim=16, use_char=True, char_dim=8)
    W, _, _ = weights
    assert W.shape[0] == 3 * (16 + 8)
    assert hist["token_acc"].iloc[-1] >= hist["token_acc"].iloc[0]
    sc = trained_scorer(alpha.to_json(), weights, embedd_dim=16,
                        use_char=True, char_dim=8)
    toks = list(df["tokens"].iloc[0])
    assert len(sc.label(toks)) == len(toks)
