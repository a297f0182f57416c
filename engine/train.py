"""Distributed CRF training (A8 — the reference's other half).

Reference semantics reproduced (file:line cites against /root/reference):
  epoch loop / shuffle / per-epoch eval   ncrf_main.py:361-478 (train():
      epoch iteration, batchified passes, end-of-epoch accuracy report)
  sequence-labeling objective             model/crf.py (the CRF layer the
      reference trains by NLL; here a structured PERCEPTRON on the same
      linear-chain factorization — decode with current weights, update
      on the feature difference between gold and predicted paths, which
      needs only the Viterbi machinery the engine already has, no
      torch autograd)
  emission features                       engine.ncrf.context_features —
      byte-identical to the inference path, so a trained model drops
      straight into SeededLinearEmissions/NcrfStage.

Distribution shape (Ray-Data-first, synchronous batch perceptron):
  - the tokenized+gold dataset is materialized ONCE and re-streamed per
    epoch;
  - per epoch the current weights go to the object store (ray.put) and
    every map_batches task computes its batch's feature-difference sums
    (dW: d x n_tags, db: n_tags, dT: (n+2)^2, plus error counts) —
    a per-batch COMBINER, emitted as one packed row per batch;
  - the driver folds the tiny per-batch partials (k*d floats each,
    streaming iter_batches — never the dataset) and applies the update.
  Synchronous batch updates make the learned weights independent of the
  partitioning (up to float summation order), unlike per-sample
  perceptron which would be order-dependent and unreproducible across
  cluster sizes.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

from .ncrf import (NcrfScorer, biose_tagset, build_pretrain_embedding,
                   constrained_transitions, context_features, viterbi_batch)
from .vocab import Alphabet, encode_tokens


def _encode_pad(token_lists: list[list[str]], alpha: Alphabet
                ) -> tuple[np.ndarray, np.ndarray]:
    ids = encode_tokens(token_lists, alpha, max_sent_length=0)
    lengths = np.array([len(s) for s in ids], dtype=np.int64)
    s_max = max(1, int(lengths.max()) if len(lengths) else 1)
    padded = np.zeros((len(ids), s_max), dtype=np.int64)
    for i, s in enumerate(ids):
        padded[i, : len(s)] = s
    return padded, lengths


def _batch_stats(df: pd.DataFrame, alpha: Alphabet, emb: np.ndarray,
                 W: np.ndarray, b: np.ndarray, T: np.ndarray,
                 tag_index: dict[str, int], tokens_col: str, gold_col: str):
    """One batch's structured-perceptron sufficient statistics."""
    n = W.shape[1]
    start, stop = n, n + 1
    toks = [list(t) for t in df[tokens_col]]
    gold = [[tag_index[g] for g in gs] for gs in df[gold_col]]
    keep = [i for i, t in enumerate(toks) if t]
    toks = [toks[i] for i in keep]
    gold = [gold[i] for i in keep]
    dW = np.zeros_like(W)
    db = np.zeros_like(b)
    dT = np.zeros_like(T)
    n_tok = n_err = 0
    if not toks:
        return dW, db, dT, n_tok, n_err
    padded, lengths = _encode_pad(toks, alpha)
    mask = np.arange(padded.shape[1])[None, :] < lengths[:, None]
    ctx = context_features(emb, padded, mask.astype(np.float64))
    feats = (ctx @ W + b) * mask[:, :, None]
    paths = viterbi_batch(feats, lengths, T)
    for i, (g, p) in enumerate(zip(gold, paths)):
        L = int(lengths[i])
        n_tok += L
        g_arr = np.asarray(g[:L])
        p_arr = np.asarray(p[:L])
        wrong = g_arr != p_arr
        n_err += int(wrong.sum())
        if not wrong.any():
            continue
        # emission updates: ctx^T (onehot(gold) - onehot(pred)),
        # vectorized with np.add.at over the sequence positions
        c = ctx[i, :L]
        np.add.at(dW.T, g_arr, c)
        np.add.at(dW.T, p_arr, -c)
        np.add.at(db, g_arr, 1.0)
        np.add.at(db, p_arr, -1.0)
        # transition updates over the augmented bigrams (START/STOP)
        gb = np.stack([np.r_[start, g_arr], np.r_[g_arr, stop]])
        pb = np.stack([np.r_[start, p_arr], np.r_[p_arr, stop]])
        np.add.at(dT, (gb[0], gb[1]), 1.0)
        np.add.at(dT, (pb[0], pb[1]), -1.0)
    return dW, db, dT, n_tok, n_err


def train_crf(ds, alphabet_json: str, tokens_col: str = "tokens",
              gold_col: str = "gold", embedd_dim: int = 64,
              epochs: int = 5, lr: float = 1.0, seed: int = 42,
              categories: tuple[str, ...] = NcrfScorer.CATEGORIES):
    """Synchronous distributed structured-perceptron training.

    Returns ((W, b, T), history) where history is a DataFrame with one
    row per epoch: (epoch, n_tokens, n_errors, token_acc) measured with
    the weights at the START of the epoch (so epoch 0 is the seeded
    init and the last row shows the gain)."""
    import ray

    alpha = Alphabet.from_json(alphabet_json)
    alpha.close()
    emb, _, _ = build_pretrain_embedding(None, alpha, embedd_dim, seed=seed)
    tags = biose_tagset(categories)
    tag_index = {t: i for i, t in enumerate(tags)}
    n = len(tags)
    rng = np.random.default_rng(seed + 1)
    W = rng.standard_normal((embedd_dim, n)) / np.sqrt(embedd_dim)
    b = rng.standard_normal(n) * 0.01
    T = constrained_transitions(tags)
    forbid_mask = T <= -1e4 + 1  # keep structural zeros forbidden

    embref = ray.put(emb)
    history = []
    ds = ds.materialize()
    for ep in range(epochs):
        wref = ray.put((W, b, T))
        dW = np.zeros_like(W)
        db = np.zeros_like(b)
        dT = np.zeros_like(T)
        n_tok = n_err = 0
        partials = ds.map_batches(
            GradStage,
            fn_constructor_kwargs={
                "alphabet_json": alphabet_json, "embref": embref,
                "wref": wref, "tag_index": tag_index,
                "tokens_col": tokens_col, "gold_col": gold_col,
            },
            batch_format="pandas", concurrency=4,
        )
        for bt in partials.iter_batches(batch_size=256,
                                        batch_format="pandas"):
            for blob in bt["blob"]:
                pW, pb_, pT, pt, pe = pickle.loads(blob)
                dW += pW
                db += pb_
                dT += pT
                n_tok += pt
                n_err += pe
        history.append(
            {"epoch": ep, "n_tokens": int(n_tok), "n_errors": int(n_err),
             "token_acc": round(1.0 - n_err / max(1, n_tok), 6)}
        )
        W = W + lr * dW  # plain perceptron step on the summed diffs
        b = b + lr * db
        T = T + lr * dT
        T[forbid_mask] = -1e4  # re-clamp structural constraints
    return (W, b, T), pd.DataFrame(history)


class GradStage:
    """Per-epoch gradient actor: alphabet + embedding + current weights
    are fetched ONCE per actor in __init__ (object-store reads), each
    __call__ emits its batch's packed sufficient statistics."""

    def __init__(self, alphabet_json: str, embref, wref, tag_index,
                 tokens_col: str, gold_col: str) -> None:
        import ray

        self.alpha = Alphabet.from_json(alphabet_json)
        self.alpha.close()
        self.emb = ray.get(embref)
        self.W, self.b, self.T = ray.get(wref)
        self.tag_index = tag_index
        self.tokens_col = tokens_col
        self.gold_col = gold_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        stats = _batch_stats(df, self.alpha, self.emb, self.W, self.b,
                             self.T, self.tag_index, self.tokens_col,
                             self.gold_col)
        return pd.DataFrame({"blob": [pickle.dumps(stats)]})


def trained_scorer(alphabet_json: str, weights, embedd_dim: int = 64,
                   seed: int = 42,
                   categories: tuple[str, ...] = NcrfScorer.CATEGORIES
                   ) -> NcrfScorer:
    """NcrfScorer wired with trained (W, b, T) — the inference path is
    unchanged (same context_features, same Viterbi), proving the
    trained weights drop into the serving stage."""
    W, b, T = weights
    sc = NcrfScorer(word_alphabet=Alphabet.from_json(alphabet_json),
                    embedd_dim=embedd_dim, seed=seed)
    sc.emissions.W = W
    sc.emissions.b = b
    sc.transitions = T
    return sc
