"""Distributed CRF training (A8 — the reference's other half).

Reference semantics reproduced (file:line cites against /root/reference):
  training objective      model/crf.py:47-103 (neg_log_likelihood_loss:
      sentence NLL = forward-score minus gold-path score); here the
      exact batch NLL gradient via forward-backward marginals — the
      same linear-chain factorization, gradients in closed form (gold
      counts minus model expectations), no autograd needed.
  epoch loop / lr regime  ncrf_main.py:361-478 (train(): epoch
      iteration over batchified data, per-epoch accuracy report,
      adaptive step — the reference decays SGD, this uses Adagrad which
      is its per-parameter analog and what makes the frozen-random-
      embedding features trainable at their small scale).
  emission features       engine.ncrf.concat_context_features — shared
      byte-identically with the serving path (LinearConcatEmissions),
      so trained weights drop into NcrfScorer unchanged.

Distribution shape (Ray-Data-first, synchronous full-batch gradient):
  - the tokenized+gold dataset is materialized ONCE and re-streamed per
    epoch;
  - per epoch the current weights go to the object store (ray.put);
    a map_batches actor pool computes each batch's sufficient
    statistics (dW: 3d x n_tags, db, dT: (n+2)^2, NLL, token errors) —
    a per-batch COMBINER emitted as one packed row;
  - the driver folds the tiny partials (streaming iter_batches — the
    dataset itself never lands on the driver) and applies one Adagrad
    step per epoch.
  Synchronous full-batch gradients make the learned weights independent
  of partitioning (up to float summation order) — per-sample SGD would
  be order-dependent and unreproducible across cluster sizes. The NLL
  is convex in (W, b, T), so the per-epoch accuracy history is the
  convergence certificate tests assert on.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

from .ncrf import (NcrfScorer, biose_tagset, build_pretrain_embedding,
                   concat_context_features, constrained_transitions,
                   viterbi_batch)
from .vocab import Alphabet, encode_tokens

_FORBID = -1e4


def _logsumexp(x: np.ndarray, axis: int) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    return (m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True))).squeeze(axis)


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
    """One batch's exact CRF-NLL sufficient statistics: gradient =
    gold feature counts minus model expectations (forward-backward
    marginals), plus Viterbi token-error counts for the history."""
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
    nll = 0.0
    if not toks:
        return dW, db, dT, n_tok, n_err, nll, 0
    padded, lengths = _encode_pad(toks, alpha)
    B, S = padded.shape
    mask = np.arange(S)[None, :] < lengths[:, None]
    ctx = concat_context_features(emb, padded, mask.astype(np.float64))
    feats = (ctx @ W + b) * mask[:, :, None]

    # forward (log-alpha), masked carry for padded steps
    la = np.zeros((B, S, n))
    la[:, 0] = T[start, :n][None, :] + feats[:, 0]
    for t in range(1, S):
        nxt = _logsumexp(la[:, t - 1][:, :, None] + T[:n, :n][None], 1) \
            + feats[:, t]
        act = (t < lengths)[:, None]
        la[:, t] = np.where(act, nxt, la[:, t - 1])
    last_a = la[np.arange(B), lengths - 1]
    log_z = _logsumexp(last_a + T[:n, stop][None, :], 1)

    # backward (log-beta); padding rows stay 0 and are masked out below
    lb = np.zeros((B, S, n))
    lb[np.arange(B), lengths - 1] = T[:n, stop][None, :]
    for t in range(S - 2, -1, -1):
        nxt = _logsumexp(
            T[:n, :n][None] + (feats[:, t + 1] + lb[:, t + 1])[:, None, :], 2
        )
        interior = (t < lengths - 1)[:, None]
        lb[:, t] = np.where(interior, nxt, lb[:, t])

    # unary marginals and gold one-hots -> emission gradients
    mu = np.exp(la + lb - log_z[:, None, None]) * mask[:, :, None]
    gm = np.zeros_like(mu)
    g_pad = np.full((B, S), -1, dtype=np.int64)
    for i, g in enumerate(gold):
        g_pad[i, : len(g)] = g
    bi, ti = np.nonzero(mask)
    gm[bi, ti, g_pad[bi, ti]] = 1.0
    diff = gm - mu
    dW += np.einsum("bsd,bsn->dn", ctx * mask[:, :, None], diff)
    db += diff.sum((0, 1))

    # transition gradients: gold bigram counts minus expected counts
    gold_score = np.zeros(B)
    for i, g in enumerate(gold):
        ga = np.asarray(g)
        dT[start, ga[0]] += 1.0
        dT[ga[-1], stop] += 1.0
        np.add.at(dT, (ga[:-1], ga[1:]), 1.0)
        pos = np.arange(len(ga))
        gold_score[i] = feats[i, pos, ga].sum() + T[start, ga[0]] \
            + T[ga[:-1], ga[1:]].sum() + T[ga[-1], stop]
    dT[start, :n] -= np.exp(
        T[start, :n][None] + feats[:, 0] + lb[:, 0] - log_z[:, None]
    ).sum(0)
    dT[:n, stop] -= np.exp(last_a + T[:n, stop][None] - log_z[:, None]).sum(0)
    for t in range(S - 1):
        act = t + 1 < lengths
        if not act.any():
            break
        lp = la[:, t][:, :, None] + T[:n, :n][None] \
            + (feats[:, t + 1] + lb[:, t + 1])[:, None, :] \
            - log_z[:, None, None]
        dT[:n, :n] -= (np.exp(lp) * act[:, None, None]).sum(0)
    nll = float((log_z - gold_score).sum())

    # Viterbi decode for the reported token accuracy
    paths = viterbi_batch(feats, lengths, T)
    for i, (g, p) in enumerate(zip(gold, paths)):
        L = int(lengths[i])
        n_tok += L
        n_err += int((np.asarray(g[:L]) != np.asarray(p[:L])).sum())
    return dW, db, dT, n_tok, n_err, nll, len(toks)


class GradStage:
    """Per-epoch gradient actor: alphabet + embedding + current weights
    are fetched ONCE per actor in __init__ (object-store reads); each
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


def train_crf(ds, alphabet_json: str, tokens_col: str = "tokens",
              gold_col: str = "gold", embedd_dim: int = 64,
              epochs: int = 12, lr: float = 1.0, seed: int = 42,
              categories: tuple[str, ...] = NcrfScorer.CATEGORIES,
              concurrency: int = 4, use_char: bool = False,
              char_dim: int = 16, char_seed: int = 13):
    """Synchronous distributed CRF-NLL training with Adagrad.

    Returns ((W, b, T), history): W is (3*d_eff, n_tags) over the
    concat window features, d_eff = embedd_dim (+char_dim with
    use_char — hashed char n-gram rows concatenated onto the embedding
    matrix, the CharCNN analog, so gradients stay exact w.r.t. the
    augmented features); history has one row per epoch with
    (epoch, n_tokens, n_errors, token_acc, nll) measured with the
    weights at the START of the epoch — epoch 0 is the init, the last
    row shows the learned state."""
    import ray

    alpha = Alphabet.from_json(alphabet_json)
    alpha.close()
    emb, _, _ = build_pretrain_embedding(None, alpha, embedd_dim, seed=seed)
    if use_char:
        from .ncrf import CharNgramFeaturizer

        ch = CharNgramFeaturizer(char_dim=char_dim, seed=char_seed)
        emb = np.concatenate([emb, ch.matrix(alpha)], axis=1)
    tags = biose_tagset(categories)
    tag_index = {t: i for i, t in enumerate(tags)}
    n = len(tags)
    W = np.zeros((3 * emb.shape[1], n))
    b = np.zeros(n)
    T = constrained_transitions(tags)
    forbid_mask = T <= _FORBID + 1  # structural zeros stay forbidden
    acc_W = np.full_like(W, 1e-8)   # Adagrad accumulators (driver state)
    acc_b = np.full_like(b, 1e-8)
    acc_T = np.full_like(T, 1e-8)

    embref = ray.put(emb)
    history = []
    ds = ds.materialize()
    for ep in range(epochs):
        wref = ray.put((W, b, T))
        dW = np.zeros_like(W)
        db = np.zeros_like(b)
        dT = np.zeros_like(T)
        n_tok = n_err = n_sent = 0
        nll = 0.0
        partials = ds.map_batches(
            GradStage,
            fn_constructor_kwargs={
                "alphabet_json": alphabet_json, "embref": embref,
                "wref": wref, "tag_index": tag_index,
                "tokens_col": tokens_col, "gold_col": gold_col,
            },
            batch_format="pandas", concurrency=concurrency,
        )
        for bt in partials.iter_batches(batch_size=256,
                                        batch_format="pandas"):
            for blob in bt["blob"]:
                pW, pb_, pT, pt, pe, pn, ps = pickle.loads(blob)
                dW += pW
                db += pb_
                dT += pT
                n_tok += pt
                n_err += pe
                nll += pn
                n_sent += ps
        history.append(
            {"epoch": ep, "n_tokens": int(n_tok), "n_errors": int(n_err),
             "token_acc": round(1.0 - n_err / max(1, n_tok), 6),
             "nll": round(nll / max(1, n_sent), 6)}
        )
        den = max(1, n_sent)
        gW, gb, gT = dW / den, db / den, dT / den
        acc_W += gW ** 2
        acc_b += gb ** 2
        acc_T += gT ** 2
        W = W + lr * gW / np.sqrt(acc_W)
        b = b + lr * gb / np.sqrt(acc_b)
        T = T + lr * gT / np.sqrt(acc_T)
        T[forbid_mask] = _FORBID  # re-clamp structural constraints
    return (W, b, T), pd.DataFrame(history)


def trained_scorer(alphabet_json: str, weights, embedd_dim: int = 64,
                   seed: int = 42,
                   categories: tuple[str, ...] = NcrfScorer.CATEGORIES,
                   use_char: bool = False, char_dim: int = 16,
                   char_seed: int = 13) -> NcrfScorer:
    """NcrfScorer wired with trained (W, b, T) — the decode path
    (Viterbi, n-best, batching) is unchanged, proving trained weights
    drop straight into the serving stage. use_char/char_dim/char_seed
    must match the train_crf call so the augmented embedding matrix
    (and hence W's input dim) is identical."""
    from .ncrf import LinearConcatEmissions

    W, b, T = weights
    sc = NcrfScorer(word_alphabet=Alphabet.from_json(alphabet_json),
                    embedd_dim=embedd_dim, seed=seed, use_char=use_char,
                    char_dim=char_dim, char_seed=char_seed)
    sc.emissions = LinearConcatEmissions(sc.emb, W, b)
    sc.transitions = T
    return sc
