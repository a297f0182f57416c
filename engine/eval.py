"""Mention/triple multiset P/R/F1 — the reference's evaluation
discipline (ne_evaluate_mentions.py:53-81: set-intersection over
(sent_id, surface, category, occurrence-index) tuples; -1 sentinels on
empty sides) in both a local and a distributed (join-count, SURVEY.md
G3) form.
"""

from __future__ import annotations

import pyarrow as pa


def prf(n_true: int, n_pred: int, n_correct: int) -> tuple[float, float, float]:
    prec = -1.0 if n_pred == 0 else n_correct / n_pred
    recall = -1.0 if n_true == 0 else n_correct / n_true
    f1 = -1.0 if prec + recall == 0 else 2 * prec * recall / (prec + recall)
    return prec, recall, f1


def _keyset(table: pa.Table, keys: list[str]) -> set[tuple]:
    cols = [table[k].to_pylist() for k in keys]
    return set(zip(*cols)) if cols and len(cols[0]) else set()


def evaluate_tables(
    gold: pa.Table, pred: pa.Table, keys: list[str]
) -> tuple[float, float, float]:
    """Local multiset eval: the occ column makes the key a multiset
    element, so plain set intersection reproduces the reference's
    counting-dict semantics (ne_evaluate_mentions.py:84-122)."""
    t, p = _keyset(gold, keys), _keyset(pred, keys)
    return prf(len(t), len(p), len(t & p))


MENTION_KEYS = ["sent_id", "level", "surface", "label", "occ"]
TRIPLE_KEYS = ["subj", "pred", "obj"]


def evaluate_datasets(gold_ds, pred_ds, keys: list[str],
                      num_partitions: int = 16) -> tuple[float, float, float]:
    """Distributed eval: inner-join pred x gold on the full key;
    correct = joined.count() (order-insensitive, exact)."""
    g = gold_ds.select_columns(keys)
    p = pred_ds.select_columns(keys)
    n_true, n_pred = g.count(), p.count()
    joined = p.join(g, "inner", num_partitions, on=tuple(keys))
    return prf(n_true, n_pred, joined.count())
