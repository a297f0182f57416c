"""Neural-scorer slot: pretrained-embedding loading plus a numpy
linear-chain CRF with batched masked Viterbi and n-best decode — the
engine's real (weight-loadable) implementation of the reference's
NCRF++ stack behind the same ``Scorer`` protocol the deterministic
gazetteer scorers satisfy (engine/scorers.py).

Reference semantics reproduced (file:line cites against /root/reference):
  load_pretrain_emb / build_pretrain_embedding
      utils/functions.py:162-218 — text embedding file parse (dim from
      first line, illegal lines skipped), perfect-match then
      case-match lookup, norm2one row normalization, OOV rows drawn
      uniform(-scale, scale) with scale = sqrt(3/dim).
  CRF decode
      model/crf.py:105-197 (_viterbi_decode): transitions augmented
      with START/STOP pseudo-tags (tag_size+2), per-step
      score[t][from][to] = emission[t][to] + transition[from][to],
      max-product DP with backpointers, masked padding.
  n-best decode
      model/crf.py:268-418 (_viterbi_decode_nbest): top-k partial
      paths per (tag, step); scores exponentiated-normalized per the
      reference's nbest path_score output.
  batching discipline
      utils/data.py / ncrf_main.py batchify: length-sorted padded
      batches, original order restored by sort index (O1/O2).

No torch in this environment, so emissions come from a deterministic
seeded linear projection over mean-pooled context windows of the
embedding rows ("BiLSTM slot": a torch encoder drops into
``emission_model`` without touching the CRF or the actor plumbing —
the import is try-gated in ``TorchEmissions``). Weights the reference
does not ship are synthesized seeded; what is validated is the full
encode -> pad -> decode -> BIOSE dataflow and exact Viterbi/n-best
optimality (tests/test_ncrf_scorer.py checks against brute force).
"""

from __future__ import annotations

import numpy as np

from .ops.labels import normalize_word
from .vocab import Alphabet, encode_tokens

START_TAG = -2  # index tag_size-2 in the augmented matrix (crf.py:14)
STOP_TAG = -1


def norm2one(vec: np.ndarray) -> np.ndarray:
    """utils/functions.py:190-192."""
    root_sum_square = np.sqrt(np.sum(np.square(vec)))
    return vec / root_sum_square if root_sum_square else vec


def load_pretrain_emb(embedding_path: str) -> tuple[dict[str, np.ndarray], int]:
    """Text embedding file -> {word: vec}, dim (utils/functions.py:194-218):
    dim inferred from the first non-empty line; later lines with a
    different token count are skipped as illegal."""
    embedd_dim = -1
    embedd_dict: dict[str, np.ndarray] = {}
    with open(embedding_path, encoding="utf8") as fh:
        for line in fh:
            tokens = line.strip().split()
            if not tokens:
                continue
            if embedd_dim < 0:
                embedd_dim = len(tokens) - 1
            elif embedd_dim + 1 != len(tokens):
                continue
            embedd_dict[tokens[0]] = np.asarray(tokens[1:], dtype=np.float64)
    return embedd_dict, embedd_dim


def build_pretrain_embedding(embedding_path: str | None, word_alphabet: Alphabet,
                             embedd_dim: int = 100, norm: bool = True,
                             seed: int = 42) -> tuple[np.ndarray, int, dict]:
    """Alphabet-aligned embedding matrix (utils/functions.py:162-188).
    Row 0 is the padding row; lookup order: exact word, word.lower(),
    else uniform(-sqrt(3/dim), +sqrt(3/dim)). The OOV draw is SEEDED
    here (deviation from the reference's global np.random) so actor
    replicas build byte-identical matrices."""
    embedd_dict: dict[str, np.ndarray] = {}
    if embedding_path is not None:
        embedd_dict, embedd_dim = load_pretrain_emb(embedding_path)
    scale = np.sqrt(3.0 / embedd_dim)
    rng = np.random.default_rng(seed)
    emb = np.zeros((word_alphabet.size(), embedd_dim), dtype=np.float64)
    stats = {"perfect_match": 0, "case_match": 0, "not_match": 0}
    for idx in range(1, word_alphabet.size()):
        word = word_alphabet.get_instance(idx)
        if word in embedd_dict:
            vec = embedd_dict[word]
            emb[idx] = norm2one(vec) if norm else vec
            stats["perfect_match"] += 1
        elif word is not None and word.lower() in embedd_dict:
            vec = embedd_dict[word.lower()]
            emb[idx] = norm2one(vec) if norm else vec
            stats["case_match"] += 1
        else:
            emb[idx] = rng.uniform(-scale, scale, embedd_dim)
            stats["not_match"] += 1
    return emb, embedd_dim, stats


# --- BIOSE tag algebra ----------------------------------------------------
def biose_tagset(categories: tuple[str, ...]) -> list[str]:
    tags = ["O"]
    for c in categories:
        for p in ("B", "I", "E", "S"):
            tags.append(f"{p}-{c}")
    return tags


def allowed_transition(a: str, b: str) -> bool:
    """Valid BIOSE bigram (the constraint a trained CRF learns;
    ne_evaluate_mentions.py validity discipline)."""
    pa, ca = (a.split("-", 1) + [""])[:2] if a != "O" else ("O", "")
    pb, cb = (b.split("-", 1) + [""])[:2] if b != "O" else ("O", "")
    if pa in ("O", "E", "S"):
        return pb in ("O", "B", "S")
    # pa in (B, I): must continue the same entity
    return pb in ("I", "E") and ca == cb


def constrained_transitions(tags: list[str], bonus: float = 0.0,
                            forbid: float = -1e4) -> np.ndarray:
    """(tag_size+2)^2 transition matrix with START/STOP rows per
    model/crf.py:30-43; invalid BIOSE bigrams get a large negative
    score so decodes are always valid sequences."""
    n = len(tags)
    T = np.full((n + 2, n + 2), bonus, dtype=np.float64)
    for i, a in enumerate(tags):
        for j, b in enumerate(tags):
            if not allowed_transition(a, b):
                T[i, j] = forbid
    start, stop = n, n + 1
    for j, b in enumerate(tags):  # START -> b: b must open (O, B-, S-)
        if b != "O" and b.split("-")[0] in ("I", "E"):
            T[start, j] = forbid
    for i, a in enumerate(tags):  # a -> STOP: a must close (O, E-, S-)
        if a != "O" and a.split("-")[0] in ("B", "I"):
            T[i, stop] = forbid
    T[:, start] = forbid
    T[stop, :] = forbid
    return T


def context_features(emb: np.ndarray, ids: np.ndarray,
                     mask: np.ndarray) -> np.ndarray:
    """Mean-pooled +-1 context window of embedding rows — the SHARED
    feature transform of inference (SeededLinearEmissions) and training
    (engine.train): the trainer's gradients are exact w.r.t. these
    features. Returns (B, S, d)."""
    x = emb[ids]                                        # (B, S, d)
    left = np.concatenate([x[:, :1], x[:, :-1]], axis=1)
    right = np.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    # replicate at each sequence's TRUE end so a padded batch decode
    # equals the unpadded single-sequence decode (the padding row is
    # all zeros and must not leak into the last token's window)
    lengths = mask.sum(axis=1).astype(np.int64)
    rows = np.arange(x.shape[0])
    last = np.maximum(lengths - 1, 0)
    right[rows, last] = x[rows, last]
    return (left + x + right) / 3.0


def concat_context_features(emb: np.ndarray, ids: np.ndarray,
                            mask: np.ndarray) -> np.ndarray:
    """[left | center | right] CONCATENATED window of embedding rows,
    (B, S, 3d) — the trainable feature map (engine.train): unlike the
    mean-pooled variant, concatenation keeps which-position identity, so
    a linear layer over it can express any window->tag lookup (the
    gazetteer task is exactly that). Same end-replication rule as
    context_features."""
    x = emb[ids]
    left = np.concatenate([x[:, :1], x[:, :-1]], axis=1)
    right = np.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    lengths = mask.sum(axis=1).astype(np.int64)
    rows = np.arange(x.shape[0])
    last = np.maximum(lengths - 1, 0)
    right[rows, last] = x[rows, last]
    return np.concatenate([left, x, right], axis=2)


class CharNgramFeaturizer:
    """Hashed char n-gram analog of the reference's CharCNN
    (model/charcnn.py:12-74): per word, boundary-marked char n-grams
    index a seeded embedding table via the hashing trick (no char
    vocabulary to ship), and max-pool over the grams — the CNN's
    max-pool over conv positions. Deterministic given (seed, n,
    n_buckets), so every actor replica builds identical features."""

    def __init__(self, char_dim: int = 16, n: int = 3,
                 n_buckets: int = 4096, seed: int = 13) -> None:
        rng = np.random.default_rng(seed)
        self.table = rng.standard_normal((n_buckets, char_dim)) \
            / np.sqrt(char_dim)
        self.n = n
        self.n_buckets = n_buckets
        self.char_dim = char_dim
        self._cache: dict[str, np.ndarray] = {}

    def word_vec(self, word: str) -> np.ndarray:
        v = self._cache.get(word)
        if v is None:
            from .textstats import Fingerprinter

            s = f"<{word}>"
            n = self.n
            grams = ([s[i : i + n] for i in range(len(s) - n + 1)]
                     if len(s) >= n else [s])
            idx = [Fingerprinter.fnv64(g) % self.n_buckets for g in grams]
            v = self._cache[word] = self.table[idx].max(axis=0)
        return v

    def matrix(self, alphabet: Alphabet) -> np.ndarray:
        """(vocab_size, char_dim) rows aligned to the alphabet; row 0
        (padding) stays zero. Concatenate onto the word-embedding
        matrix so every window feature map (mean-pooled or concat)
        carries char-level signal with no emission-model changes."""
        out = np.zeros((alphabet.size(), self.char_dim), dtype=np.float64)
        for idx in range(1, alphabet.size()):
            w = alphabet.get_instance(idx)
            if w is not None:
                out[idx] = self.word_vec(w)
        return out


class FeatureEmbedder:
    """The reference's extra-feature-column surface (utils/data.py:
    187-213 feature alphabets, utils/functions.py:110-117 feature
    embedding build): a CLOSED feature alphabet (e.g. '[POS]NOUN'
    values) with a seeded embedding table; per-token feature strings
    encode to table rows, unseen values fall back to the </unk> row,
    padding row 0 is zero."""

    def __init__(self, values: list[str], feat_dim: int = 8,
                 seed: int = 17) -> None:
        self.alpha = Alphabet("feature")
        for v in values:
            self.alpha.add(v)
        self.alpha.close()
        rng = np.random.default_rng(seed)
        self.table = rng.standard_normal((self.alpha.size(), feat_dim)) \
            / np.sqrt(feat_dim)
        self.table[0] = 0.0
        self.feat_dim = feat_dim

    def encode_pad(self, feature_lists: list[list[str]], S: int) -> np.ndarray:
        ids = np.zeros((len(feature_lists), S), dtype=np.int64)
        for i, fs in enumerate(feature_lists):
            for j, f in enumerate(fs[:S]):
                ids[i, j] = self.alpha.get_index(f)
        return ids

    def features(self, feature_lists: list[list[str]], S: int) -> np.ndarray:
        return self.table[self.encode_pad(feature_lists, S)]  # (B, S, fd)


class LinearConcatEmissions:
    """Emission model over concat_context_features — the serving slot
    for weights learned by engine.train.train_crf (W: (3d, n_tags))."""

    def __init__(self, emb: np.ndarray, W: np.ndarray, b: np.ndarray) -> None:
        self.emb = emb
        self.W = W
        self.b = b

    def __call__(self, ids: np.ndarray, mask: np.ndarray,
                 extra: np.ndarray | None = None) -> np.ndarray:
        ctx = concat_context_features(self.emb, ids, mask)
        if extra is not None:
            ctx = np.concatenate([ctx, extra], axis=2)
        return (ctx @ self.W + self.b) * mask[:, :, None]


class SeededLinearEmissions:
    """Deterministic emission model: mean-pooled +-1 context window of
    embedding rows -> seeded linear projection to tag scores. This is
    the "BiLSTM slot" (model/wordsequence.py:14-112 in the reference):
    any callable (ids_padded, mask) -> (batch, seq, n_tags) fits."""

    def __init__(self, emb: np.ndarray, n_tags: int, seed: int = 7,
                 extra_dim: int = 0) -> None:
        rng = np.random.default_rng(seed)
        d = emb.shape[1] + extra_dim
        self.emb = emb
        self.W = rng.standard_normal((d, n_tags)) / np.sqrt(d)
        self.b = rng.standard_normal(n_tags) * 0.01

    def __call__(self, ids: np.ndarray, mask: np.ndarray,
                 extra: np.ndarray | None = None) -> np.ndarray:
        ctx = context_features(self.emb, ids, mask)
        if extra is not None:
            ctx = np.concatenate([ctx, extra], axis=2)
        feats = ctx @ self.W + self.b                   # (B, S, n_tags)
        return feats * mask[:, :, None]


class TorchEmissions:  # pragma: no cover - torch absent in this env
    """Drop-in torch BiLSTM emission model for the same slot; gated on
    torch availability (environment ships none). The torch-less path
    for REAL NCRF++ checkpoints is NcrfCheckpointEmissions below."""

    def __init__(self, *a, **kw) -> None:
        try:
            import torch  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "torch is not available in this environment; use "
                "NcrfCheckpointEmissions (pure-numpy NCRF++ forward) "
                "or SeededLinearEmissions") from e


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def lstm_forward(x: np.ndarray, lengths: np.ndarray, w_ih: np.ndarray,
                 w_hh: np.ndarray, b_ih: np.ndarray, b_hh: np.ndarray,
                 reverse: bool = False) -> np.ndarray:
    """One-direction LSTM over a padded batch, torch semantics: gate
    order (i, f, g, o) in the stacked (4H, *) weights, c' = f*c + i*g,
    h' = o*tanh(c'). ``reverse=True`` runs each sequence from its LAST
    VALID position backward (pack_padded_sequence semantics — padding
    never enters the recurrence in either direction). Returns
    (B, S, H) with zeros at padded positions."""
    B, S, _ = x.shape
    H = w_hh.shape[1]
    out = np.zeros((B, S, H))
    h = np.zeros((B, H))
    c = np.zeros((B, H))
    bias = b_ih + b_hh
    steps = range(S - 1, -1, -1) if reverse else range(S)
    for t in steps:
        valid = (t < lengths)[:, None]
        gates = x[:, t] @ w_ih.T + h @ w_hh.T + bias
        i = _sigmoid(gates[:, :H])
        f = _sigmoid(gates[:, H:2 * H])
        g = np.tanh(gates[:, 2 * H:3 * H])
        o = _sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        c = np.where(valid, c_new, c)
        h = np.where(valid, h_new, h)
        out[:, t] = np.where(valid, h_new, 0.0)
    return out


def char_cnn_features(char_ids: np.ndarray, char_emb: np.ndarray,
                      conv_w: np.ndarray, conv_b: np.ndarray) -> np.ndarray:
    """CharCNN.get_last_hiddens (model/charcnn.py:40-54) in numpy:
    embed -> conv1d(kernel k, padding k//2) -> max-pool over positions.
    char_ids: (N, L); conv_w: (hidden, char_dim, k). Like the
    reference, positions are NOT length-masked (the conv and pool see
    the pad-char embedding rows); unlike the reference the pad width
    is the caller's fixed L, not the batch max — batch-invariant by
    design."""
    N, L = char_ids.shape
    k = conv_w.shape[2]
    emb = char_emb[char_ids]                       # (N, L, d)
    pad = k // 2
    x = np.pad(emb, ((0, 0), (pad, pad), (0, 0)))  # (N, L+2p, d)
    win = np.lib.stride_tricks.sliding_window_view(
        x, k, axis=1)                              # (N, L', d, k)
    convd = np.einsum("nldk,hdk->nhl", win, conv_w) + conv_b[None, :, None]
    return convd.max(axis=2)                       # (N, hidden)


class NcrfCheckpointEmissions:
    """REAL NCRF++ weights behind the emission slot, no torch: word
    embedding + CharCNN + BiLSTM + hidden2tag forward
    (model/wordsequence.py:14-112, model/wordrep.py:15-119,
    model/charcnn.py:12-74) over a state dict loaded by
    engine.torchckpt.load_state_dict from a ``torch.save`` zip.

    State-dict keys follow SeqLabel (model/seqlabel.py:31-33):
    ``word_hidden.wordrep.word_embedding.weight``,
    ``word_hidden.wordrep.char_feature.char_embeddings.weight`` /
    ``...char_cnn.{weight,bias}`` (optional),
    ``word_hidden.lstm.{weight,bias}_{ih,hh}_l0[ _reverse]``,
    ``word_hidden.hidden2tag.{weight,bias}``, ``crf.transitions``.

    The slot contract is unchanged: __call__(ids, mask, extra) ->
    (B, S, n_out) where n_out = label_alphabet_size + 2 (the CRF's
    augmented tag space — callers slice their label columns via
    ``label_ids``). Char inputs are derived from the word alphabet
    once at construction (vocab word -> char-id row), so per batch the
    char path is one gather + one conv — no per-word Python."""

    def __init__(self, state: dict[str, np.ndarray],
                 word_alphabet: Alphabet,
                 char_alphabet: Alphabet | None = None) -> None:
        g = {k: np.asarray(v, dtype=np.float64) for k, v in state.items()}
        self.word_emb = g["word_hidden.wordrep.word_embedding.weight"]
        self.w_ih_f = g["word_hidden.lstm.weight_ih_l0"]
        self.w_hh_f = g["word_hidden.lstm.weight_hh_l0"]
        self.b_ih_f = g["word_hidden.lstm.bias_ih_l0"]
        self.b_hh_f = g["word_hidden.lstm.bias_hh_l0"]
        self.bidirectional = "word_hidden.lstm.weight_ih_l0_reverse" in g
        if self.bidirectional:
            self.w_ih_r = g["word_hidden.lstm.weight_ih_l0_reverse"]
            self.w_hh_r = g["word_hidden.lstm.weight_hh_l0_reverse"]
            self.b_ih_r = g["word_hidden.lstm.bias_ih_l0_reverse"]
            self.b_hh_r = g["word_hidden.lstm.bias_hh_l0_reverse"]
        self.h2t_w = g["word_hidden.hidden2tag.weight"]
        self.h2t_b = g["word_hidden.hidden2tag.bias"]
        self.crf_transitions = g.get("crf.transitions")

        ck = "word_hidden.wordrep.char_feature.char_embeddings.weight"
        self.use_char = ck in g
        if self.use_char:
            if char_alphabet is None:
                raise ValueError(
                    "checkpoint has char weights; a char_alphabet "
                    "aligned to its char embedding rows is required")
            self.char_emb = g[ck]
            self.conv_w = g["word_hidden.wordrep.char_feature.char_cnn.weight"]
            self.conv_b = g["word_hidden.wordrep.char_feature.char_cnn.bias"]
            # vocab word -> fixed-width char-id row, built once
            V = word_alphabet.size()
            L = max(
                (len(word_alphabet.get_instance(i) or "")
                 for i in range(1, V)), default=1) or 1
            self.char_ids = np.zeros((V, L), dtype=np.int64)
            for i in range(1, V):
                w = word_alphabet.get_instance(i) or ""
                for j, ch in enumerate(w[:L]):
                    self.char_ids[i, j] = char_alphabet.get_index(ch)
        in_dim = self.word_emb.shape[1] + (
            self.conv_w.shape[0] if self.use_char else 0)
        if in_dim != self.w_ih_f.shape[1]:
            raise ValueError(
                f"checkpoint input width mismatch: word+char = {in_dim} "
                f"but lstm.weight_ih_l0 expects {self.w_ih_f.shape[1]} "
                "(feature_embeddings inputs are not wired in this slot)")

    @classmethod
    def from_checkpoint(cls, path: str, word_alphabet: Alphabet,
                        char_alphabet: Alphabet | None = None
                        ) -> "NcrfCheckpointEmissions":
        from .torchckpt import load_state_dict

        return cls(load_state_dict(path), word_alphabet, char_alphabet)

    def __call__(self, ids: np.ndarray, mask: np.ndarray,
                 extra: np.ndarray | None = None) -> np.ndarray:
        B, S = ids.shape
        lengths = mask.astype(np.int64).sum(axis=1)
        x = self.word_emb[ids]                       # (B, S, d)
        if self.use_char:
            ch = char_cnn_features(
                self.char_ids[ids].reshape(B * S, -1),
                self.char_emb, self.conv_w, self.conv_b)
            x = np.concatenate([x, ch.reshape(B, S, -1)], axis=2)
        fwd = lstm_forward(x, lengths, self.w_ih_f, self.w_hh_f,
                           self.b_ih_f, self.b_hh_f)
        if self.bidirectional:
            bwd = lstm_forward(x, lengths, self.w_ih_r, self.w_hh_r,
                               self.b_ih_r, self.b_hh_r, reverse=True)
            fwd = np.concatenate([fwd, bwd], axis=2)
        feats = fwd @ self.h2t_w.T + self.h2t_b
        return feats * mask[:, :, None]


def remap_checkpoint_crf(transitions: np.ndarray,
                         label_ids: list[int]) -> np.ndarray:
    """NCRF++ CRF transitions ((label_alphabet_size+2)^2, START at
    index -2, STOP at -1 — model/crf.py:14,46) -> the engine layout
    (n+2, n+2) over the caller's ``label_ids`` column selection, START
    at n, STOP at n+1. transition[from][to] orientation is shared, so
    this is one fancy-index gather."""
    t = np.asarray(transitions, dtype=np.float64)
    full = t.shape[0]
    sel = list(label_ids) + [full - 2, full - 1]
    return t[np.ix_(sel, sel)]


def ncrf_label_ids(tags: list[str], n_reserved: int = 1) -> list[int]:
    """Column ids of ``tags`` in an NCRF++ label alphabet that reserved
    ``n_reserved`` leading ids (index 0 is the padding label in every
    reference .dset — utils/alphabet.py:17-24)."""
    return [n_reserved + i for i in range(len(tags))]


def viterbi_batch(feats: np.ndarray, lengths: np.ndarray,
                  transitions: np.ndarray) -> list[list[int]]:
    """Masked batched max-product decode (model/crf.py:105-197).
    feats: (B, S, n_tags) raw emissions; transitions: (n+2, n+2)."""
    B, S, n = feats.shape
    start, stop = n, n + 1
    T = transitions[:n, :n]                             # tag->tag
    dp = transitions[start, :n][None, :] + feats[:, 0]  # (B, n)
    bps = np.zeros((B, S, n), dtype=np.int64)
    for t in range(1, S):
        cand = dp[:, :, None] + T[None, :, :]           # (B, from, to)
        best_from = cand.argmax(axis=1)                 # (B, to)
        new_dp = np.take_along_axis(cand, best_from[:, None, :], 1)[:, 0] \
            + feats[:, t]
        active = (t < lengths)[:, None]
        dp = np.where(active, new_dp, dp)
        bps[:, t] = np.where(active, best_from, np.arange(n)[None, :])
    final = dp + transitions[:n, stop][None, :]
    out: list[list[int]] = []
    for b in range(B):
        L = int(lengths[b])
        path = [int(final[b].argmax())]
        for t in range(L - 1, 0, -1):
            path.append(int(bps[b, t, path[-1]]))
        out.append(path[::-1])
    return out


def viterbi_nbest(feats: np.ndarray, length: int, transitions: np.ndarray,
                  nbest: int) -> list[tuple[list[int], float]]:
    """Top-k paths for ONE sequence (model/crf.py:268-418 semantics,
    unbatched: the reference notes its own nbest is per-decode-call).
    Scores are path log-scores; ties broken by path lexicographic
    order for determinism."""
    n = transitions.shape[0] - 2
    start, stop = n, n + 1
    # beam entries: (score, path tuple)
    beams: list[list[tuple[float, tuple[int, ...]]]] = [[] for _ in range(n)]
    for j in range(n):
        beams[j] = [(transitions[start, j] + feats[0, j], (j,))]
    for t in range(1, length):
        new_beams: list[list[tuple[float, tuple[int, ...]]]] = []
        for j in range(n):
            cand: list[tuple[float, tuple[int, ...]]] = []
            for i in range(n):
                for sc, path in beams[i]:
                    cand.append((sc + transitions[i, j] + feats[t, j],
                                 path + (j,)))
            cand.sort(key=lambda x: (-x[0], x[1]))
            new_beams.append(cand[:nbest])
        beams = new_beams
    finals: list[tuple[float, tuple[int, ...]]] = []
    for j in range(n):
        for sc, path in beams[j]:
            finals.append((sc + transitions[j, stop], path))
    finals.sort(key=lambda x: (-x[0], x[1]))
    return [(list(p), float(s)) for s, p in finals[:nbest]]


class NcrfScorer:
    """Scorer-protocol implementation: vocab encode (S5) -> pad +
    length-sort batch (A2/O1) -> emissions -> CRF Viterbi (A4) ->
    BIOSE labels in original order (O2). Built once per actor
    (__init__ cost amortized across batches, map_batches actor-pool
    discipline)."""

    CATEGORIES = ("PER", "ORG", "GPE", "LOC", "EVE", "FAC", "WOA")

    def __init__(self, word_alphabet: Alphabet | None = None,
                 embedding_path: str | None = None, embedd_dim: int = 32,
                 seed: int = 42, use_char: bool = False, char_dim: int = 16,
                 char_seed: int = 13,
                 feature_values: list[str] | None = None,
                 feat_dim: int = 8,
                 checkpoint_path: str | None = None,
                 char_alphabet_json: str | None = None) -> None:
        self.alpha = word_alphabet or Alphabet("word")
        self.alpha.close()  # ids must stay within the embedding matrix
        self.tags = biose_tagset(self.CATEGORIES)
        self.featurizer = (FeatureEmbedder(feature_values, feat_dim)
                           if feature_values else None)
        if checkpoint_path is not None:
            # REAL NCRF++ weights, no torch: numpy WordRep + BiLSTM +
            # hidden2tag + the checkpoint's own CRF transitions
            chalpha = (Alphabet.from_json(char_alphabet_json)
                       if char_alphabet_json else None)
            ck = NcrfCheckpointEmissions.from_checkpoint(
                checkpoint_path, self.alpha, chalpha)
            label_ids = ncrf_label_ids(self.tags)
            n_out = ck.h2t_w.shape[0]
            if max(label_ids) >= n_out - 2:
                raise ValueError(
                    f"checkpoint emits {n_out} columns "
                    f"(label_alphabet_size+2) but the tag set needs id "
                    f"{max(label_ids)} — label alphabets do not match")
            if ck.crf_transitions is not None:
                self.transitions = remap_checkpoint_crf(
                    ck.crf_transitions, label_ids)
            else:
                self.transitions = constrained_transitions(self.tags)
            self._ck = ck
            self._label_ids = np.asarray(label_ids)
            self.emissions = self._checkpoint_emissions
            self.emb_stats = {"checkpoint": checkpoint_path}
            return
        self.emb, dim, self.emb_stats = build_pretrain_embedding(
            embedding_path, self.alpha, embedd_dim, seed=seed)
        if use_char:
            # char-level signal rides the embedding matrix itself
            # (CharCNN analog, model/charcnn.py:12-74): every window
            # feature map downstream carries it unchanged
            ch = CharNgramFeaturizer(char_dim=char_dim, seed=char_seed)
            self.emb = np.concatenate([self.emb, ch.matrix(self.alpha)],
                                      axis=1)
        self.transitions = constrained_transitions(self.tags)
        self.emissions = SeededLinearEmissions(
            self.emb, len(self.tags), seed=seed + 1,
            extra_dim=self.featurizer.feat_dim if self.featurizer else 0)

    def _checkpoint_emissions(self, ids: np.ndarray, mask: np.ndarray,
                              extra: np.ndarray | None = None) -> np.ndarray:
        return self._ck(ids, mask, extra)[:, :, self._label_ids]

    def _encode_pad(self, token_lists: list[list[str]]
                    ) -> tuple[np.ndarray, np.ndarray]:
        ids = encode_tokens(token_lists, self.alpha, max_sent_length=0)
        lengths = np.array([len(s) for s in ids], dtype=np.int64)
        S = max(1, int(lengths.max()) if len(lengths) else 1)
        padded = np.zeros((len(ids), S), dtype=np.int64)
        for i, s in enumerate(ids):
            padded[i, : len(s)] = s
        return padded, lengths

    def label_batch(self, token_lists: list[list[str]],
                    feature_lists: list[list[str]] | None = None
                    ) -> list[list[str]]:
        """Length-sorted padded decode, original order restored —
        batchify_with_label/recover semantics (utils/data.py,
        ncrf_main.py:252-268). `feature_lists` (optional, parallel to
        `token_lists`) is the [POS]word extra-feature surface."""
        if not token_lists:
            return []
        order = np.argsort([-len(t) for t in token_lists], kind="stable")
        sorted_lists = [token_lists[i] for i in order]
        padded, lengths = self._encode_pad(sorted_lists)
        mask = (np.arange(padded.shape[1])[None, :] < lengths[:, None])
        extra = None
        if self.featurizer is not None:
            if feature_lists is not None:
                extra = self.featurizer.features(
                    [feature_lists[i] for i in order], padded.shape[1])
            else:
                # feature-aware scorer, feature-less input: zero-fill the
                # extra block (padding-row semantics — row 0 of the
                # feature table is zero) instead of letting the emission
                # matmul fail on a dimension mismatch (ADVICE r3)
                extra = np.zeros(
                    (padded.shape[0], padded.shape[1],
                     self.featurizer.feat_dim))
        feats = self.emissions(padded, mask.astype(np.float64), extra)
        paths = viterbi_batch(feats, lengths, self.transitions)
        restored: list[list[str]] = [[] for _ in token_lists]
        for pos, i in enumerate(order):
            restored[i] = [self.tags[j] for j in paths[pos]]
        return restored

    def label(self, tokens: list[str],
              features: list[str] | None = None) -> list[str]:
        if not tokens:
            return []
        return self.label_batch(
            [tokens], [features] if features is not None else None)[0]

    def label_nbest(self, tokens: list[str], n: int = 3,
                    features: list[str] | None = None
                    ) -> list[tuple[list[str], float]]:
        if not tokens:
            return []
        padded, lengths = self._encode_pad([tokens])
        mask = (np.arange(padded.shape[1])[None, :] < lengths[:, None])
        extra = None
        if self.featurizer is not None:
            extra = (self.featurizer.features([features], padded.shape[1])
                     if features is not None
                     else np.zeros((1, padded.shape[1],
                                    self.featurizer.feat_dim)))
        feats = self.emissions(padded, mask.astype(np.float64), extra)[0]
        out = viterbi_nbest(feats, int(lengths[0]), self.transitions, n)
        return [([self.tags[j] for j in p], round(s, 6)) for p, s in out]


class NcrfStage:
    """map_batches actor wrapper: token-list column in, BIOSE label
    column out; the scorer (alphabet + embedding matrix + CRF) is built
    once per actor in __init__ (api_main.py:53-80 model-registry
    discipline). Construct with vocab words or an Alphabet JSON so
    every replica builds an identical model."""

    def __init__(self, words: list[str] | None = None,
                 alphabet_json: str | None = None,
                 embedding_path: str | None = None, embedd_dim: int = 32,
                 seed: int = 42, tokens_col: str = "tokens",
                 out_col: str = "labels", use_char: bool = False,
                 char_dim: int = 16,
                 feature_values: list[str] | None = None,
                 feat_dim: int = 8,
                 features_col: str | None = None,
                 checkpoint_path: str | None = None,
                 char_alphabet_json: str | None = None) -> None:
        if alphabet_json is not None:
            alpha = Alphabet.from_json(alphabet_json)
        else:
            alpha = Alphabet("word")
            for w in words or []:
                alpha.add(w)
        self.sc = NcrfScorer(word_alphabet=alpha,
                             embedding_path=embedding_path,
                             embedd_dim=embedd_dim, seed=seed,
                             use_char=use_char, char_dim=char_dim,
                             feature_values=feature_values,
                             feat_dim=feat_dim,
                             checkpoint_path=checkpoint_path,
                             char_alphabet_json=char_alphabet_json)
        self.tokens_col = tokens_col
        self.out_col = out_col
        self.features_col = features_col

    def __call__(self, df):
        df = df.copy()
        feats = None
        if self.features_col is not None:
            if self.features_col not in df:
                # a configured feature column that vanished from a batch
                # is a pipeline bug — fail loudly instead of silently
                # decoding feature-less (ADVICE r3)
                raise ValueError(
                    f"NcrfStage: features_col {self.features_col!r} is "
                    f"configured but missing from the batch (columns: "
                    f"{list(df.columns)})")
            feats = [list(f) for f in df[self.features_col]]
        df[self.out_col] = self.sc.label_batch(
            [list(t) for t in df[self.tokens_col]], feats)
        return df


def normalize_tokens(tokens: list[str]) -> list[str]:
    return [normalize_word(t) for t in tokens]
