"""Vocabulary machinery — the reference's Alphabet + instance encoding
surface (utils/alphabet.py:17-98, utils/functions.py:21-159,
utils/data.py:342-351), re-expressed for actor-held state.

  Alphabet        bidirectional string<->int with index 0 reserved for
                  padding and an </unk> fallback; closable (no growth).
  build_vocab     distributed vocab build: token counts via
                  per-batch partial counts -> groupby token -> ids
                  assigned by (count desc, token) — deterministic.
  encode_tokens   vectorized token-list -> id-list encoding with digit
                  normalization (the scorer-actor side of S5; sentences
                  longer than max_sent_length are dropped, mirroring
                  MAX_SENTENCE_LENGTH=250 at utils/data.py:25).
"""

from __future__ import annotations

import json

from .ops.labels import normalize_word

UNK = "</unk>"
MAX_SENTENCE_LENGTH = 250


class Alphabet:
    def __init__(self, name: str = "word", keep_growing: bool = True) -> None:
        self.name = name
        self.keep_growing = keep_growing
        self._to_id: dict[str, int] = {}
        self._items: list[str] = []
        self.add(UNK)

    def add(self, item: str) -> int:
        if item not in self._to_id:
            self._to_id[item] = len(self._items) + 1  # index 0 reserved
            self._items.append(item)
        return self._to_id[item]

    def get_index(self, item: str) -> int:
        idx = self._to_id.get(item)
        if idx is not None:
            return idx
        if self.keep_growing:
            return self.add(item)
        return self._to_id[UNK]

    def get_instance(self, idx: int) -> str | None:
        if idx == 0:
            return None
        return self._items[idx - 1]

    def close(self) -> None:
        self.keep_growing = False

    def size(self) -> int:
        return len(self._items) + 1

    # artifact save/load (the .dset analog — JSON, not pickle)
    def to_json(self) -> str:
        return json.dumps({"name": self.name, "items": self._items})

    @classmethod
    def from_json(cls, s: str) -> "Alphabet":
        d = json.loads(s)
        a = cls(d["name"], keep_growing=False)
        for item in d["items"]:
            if item != UNK:
                a._to_id[item] = len(a._items) + 1
                a._items.append(item)
        return a


def build_vocab(ds, tokens_col: str = "tokens", min_count: int = 1,
                normalize_digits: bool = True) -> Alphabet:
    """Distributed vocab build over a Dataset with a list<string> token
    column: per-batch partial counts (map-side combiner) -> one groupby
    -> deterministic id order (count desc, token asc)."""
    import pandas as pd

    def partial(t) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for toks in t[tokens_col].to_pylist():
            for tok in toks:
                c[normalize_word(tok) if normalize_digits else tok] += 1
        return pd.DataFrame(
            {"token": list(c.keys()), "n": list(c.values())}
        )

    # vocab key space grows with the corpus: bucket-fold sum instead
    # of Ray's per-group hash aggregate (shuffle.grouped_sum)
    from .shuffle import grouped_sum

    counts = (
        grouped_sum(ds.map_batches(partial, batch_format="pyarrow"),
                    "token", "n")
        .to_pandas()
    )
    counts = counts[counts["n"] >= min_count]
    counts = counts.sort_values(["n", "token"], ascending=[False, True])
    alpha = Alphabet("word")
    for tok in counts["token"]:
        alpha.add(tok)
    alpha.close()
    return alpha


def encode_tokens(token_lists: list[list[str]], alpha: Alphabet,
                  normalize_digits: bool = True,
                  max_sent_length: int = MAX_SENTENCE_LENGTH) -> list[list[int]]:
    """Sentences longer than max_sent_length drop (utils/data.py:25 /
    utils/functions.py:137 read-path behavior)."""
    out = []
    for toks in token_lists:
        if max_sent_length and len(toks) > max_sent_length:
            continue
        if normalize_digits:
            toks = [normalize_word(t) for t in toks]
        out.append([alpha.get_index(t) for t in toks])
    return out
