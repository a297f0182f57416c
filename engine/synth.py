"""Deterministic synthetic transcript corpus (FIXTURES.md F1).

Exact ``input_hint`` shape: (conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp[us]). Generation is keyed per
conversation — ``gen_conv(conv_idx, seed)`` is a pure function of its
arguments — so the corpus is reproducible at any scale and generation
parallelizes over conversations with Ray without RNG-order dependence.

Text embeds entity surfaces from the fixed world table
(engine.scorers.ENTITIES), multi-word mentions, relation phrases,
digit runs (exercising digit-normalization), and prefix-fused tokens
(``be'Tel Aviv``) exercising the morphological lattice track, following
the pattern of the reference's example.txt corpus. ~1% of conversations
get 50-500 turns (the skew tail); rows are shuffled across conversations
on write so consumers must actually reassemble by (conv_id, turn_idx).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .scorers import ENTITIES

EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_CANON_IDS = sorted(ENTITIES)
_ALIASES: list[tuple[str, str]] = [  # (canon_id, alias surface)
    (cid, alias) for cid in _CANON_IDS for alias in ENTITIES[cid][1]
]
# prefixes: mostly known-to-everyone, occasionally the asymmetric ones
_PREFIXES = ["be", "le", "ve", "be", "le", "ve", "mi", "she", "ha", "xa"]

_REL_PHRASES = [
    "works at", "worked at", "met", "visited", "acquired", "located in",
    "attended", "traveled to", "joined", "moved to",
]
_TAILS = ["", "since 2019", "on day 17", "with 12 others", "at 15:30", "last week"]
_FILLERS = [
    "so", "well", "anyway", "for the record", "as discussed", "note that",
]
_NOISE = [
    "the quarterly report shows 1024 new signups and 37 churned accounts .",
    "please rerun the job with batch size 4096 and 8 workers .",
    "lunch is at 12:30 in room 402 .",
    "the build failed 3 times before passing on retry 4 .",
    "remember to update the docs before the 2026 release .",
]
_TOOLS = ["search", "calculator", "browser", "db_query"]


def _pick(rng: np.random.Generator, seq):
    return seq[int(rng.integers(0, len(seq)))]


def _mention(rng: np.random.Generator, fuse_p: float = 0.35) -> str:
    """An entity alias surface, possibly with a fused prefix on its
    first token (apostrophe-marked, see engine.ops.lattice)."""
    _cid, alias = _pick(rng, _ALIASES)
    if rng.random() < fuse_p:
        pref = _pick(rng, _PREFIXES)
        toks = alias.split(" ")
        toks[0] = f"{pref}'{toks[0]}"
        alias = " ".join(toks)
    return alias


def gen_turn_text(rng: np.random.Generator) -> str:
    r = rng.random()
    if r < 0.25:
        return _pick(rng, _NOISE)
    a, b = _mention(rng), _mention(rng)
    rel = _pick(rng, _REL_PHRASES)
    if r < 0.55:
        tail = _pick(rng, _TAILS)
        return f"{a} {rel} {b} {tail} .".replace("  ", " ")
    if r < 0.75:
        return f"{_pick(rng, _FILLERS)} {a} {rel} {b} ."
    if r < 0.9:
        return f"did {a} really {rel} {b} ?"
    c = _mention(rng)
    return f"{a} and {b} attended {c} ."


def gen_conv(conv_idx: int, seed: int = 42) -> list[dict]:
    rng = np.random.default_rng([seed, conv_idx])
    if rng.random() < 0.01:
        n_turns = int(rng.integers(50, 501))
    else:
        n_turns = int(rng.integers(2, 21))
    conv_id = f"c{conv_idx:08d}"
    rows = []
    roles = ("user", "assistant", "tool")
    for t in range(n_turns):
        role = roles[t % 3]
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": gen_turn_text(rng),
                "tool": _pick(rng, _TOOLS) if role == "tool" else None,
                "ts": EPOCH_US + conv_idx * 3_600_000_000 + t * 7_000_000,
            }
        )
    return rows


def conv_table(conv_indices, seed: int = 42) -> pa.Table:
    rows = [r for i in conv_indices for r in gen_conv(int(i), seed)]
    return pa.Table.from_pylist(rows).cast(_schema())


def _schema() -> pa.Schema:
    from .schema import TRANSCRIPTS

    return TRANSCRIPTS


def make_transcripts_local(n_convs: int, seed: int = 42, shuffle: bool = True) -> pa.Table:
    """Small-scale in-process corpus for tests and the oracle."""
    t = conv_table(range(n_convs), seed)
    if shuffle:
        rng = np.random.default_rng(seed)
        t = t.take(pa.array(rng.permutation(len(t)), type=pa.int64()))
    return t


def make_transcripts(out_dir: str, n_convs: int, seed: int = 42) -> None:
    """Distributed corpus writer: one task per conversation range, rows
    shuffled across conversations (Ray must already be initialised or
    auto-init)."""
    import ray.data as rd

    ds = rd.range(n_convs, override_num_blocks=max(1, n_convs // 2000))
    ds = ds.map_batches(
        lambda b: conv_table(b["id"], seed),
        batch_format="numpy",
        batch_size=2000,
    )
    # materialize() before random_shuffle: Ray 2.49 mis-fuses the shuffle
    # onto the fused read+map stage ("Not a block type: ReadTask")
    ds.materialize().random_shuffle(seed=seed).write_parquet(out_dir)
