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


def positional_f1(gold_sents: list[list[str]], pred_sents: list[list[str]]
                  ) -> tuple[float, float, float, float]:
    """Position-indexed span P/R/F1 + token accuracy — the CoNLL-style
    training-time metric (utils/metric.py:15-166 semantics: spans keyed
    by (sent, start, end, label) from BIOES tags, labels upper-cased).
    Inputs are parallel per-sentence label lists."""
    from .ops.spans import parse_spans

    correct_tok = total_tok = 0
    gold_spans: set[tuple] = set()
    pred_spans: set[tuple] = set()
    for i, (g, p) in enumerate(zip(gold_sents, pred_sents)):
        g = [x.upper() for x in g]
        p = [x.upper() for x in p]
        total_tok += len(g)
        correct_tok += sum(1 for a, b in zip(g, p) if a == b)
        toks = [""] * len(g)
        for surf, lab, s, e in parse_spans(toks, g):
            gold_spans.add((i, s, e, lab))
        for surf, lab, s, e in parse_spans(toks, p):
            pred_spans.add((i, s, e, lab))
    prec, rec, f1 = prf(len(gold_spans), len(pred_spans),
                        len(gold_spans & pred_spans))
    acc = correct_tok / total_tok if total_tok else -1.0
    return acc, prec, rec, f1


def evaluate_datasets(gold_ds, pred_ds, keys: list[str]) -> tuple[float, float, float]:
    """Distributed eval: the G3 join-count expressed as a co-group —
    digest the full key per row, tag the side, union, groupby(digest);
    correct = number of digests present on both sides. One shuffle of
    digest+flag rows, never of payloads. (occ in the key makes every
    digest unique per side, so presence-on-both == multiset match.)"""

    def digest(side: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = [t[k].to_pylist() for k in keys]
            ks = ["\x1f".join(map(str, row)) for row in zip(*cols)] if cols else []
            return pa.table(
                {"k": pa.array(ks, pa.string()),
                 "side": pa.array([side] * len(ks), pa.string())}
            )

        return fn

    g = gold_ds.map_batches(digest("g"), batch_format="pyarrow")
    p = pred_ds.map_batches(digest("p"), batch_format="pyarrow")

    from ray.data.aggregate import Sum

    def flag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_g = pc.cast(pc.equal(t["side"], "g"), pa.int64())
        return pa.table({"k": t["k"], "g": is_g,
                         "p": pc.subtract(pa.scalar(1, pa.int64()), is_g)})

    # bucket-fold per distinct digest (the occ index makes each digest
    # appear at most once per side; the digest key space scales with
    # the corpus, so Ray's per-group aggregate overhead is avoided —
    # shuffle.grouped_sum), then a per-batch partial fold + tiny
    # global sum — no per-key Python call anywhere
    from .shuffle import grouped_sum

    per_key = grouped_sum(
        g.union(p).map_batches(flag, batch_format="pyarrow"),
        "k", ["g", "p"],
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        both = pc.and_(pc.greater(t["g"], 0), pc.greater(t["p"], 0))
        return pa.table(
            {
                "c": pa.array([pc.sum(pc.cast(both, pa.int64())).as_py() or 0],
                              pa.int64()),
                "ng": pa.array([pc.sum(t["g"]).as_py() or 0], pa.int64()),
                "np": pa.array([pc.sum(t["p"]).as_py() or 0], pa.int64()),
            }
        )

    agg = per_key.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("c", alias_name="c"), Sum("ng", alias_name="g"),
        Sum("np", alias_name="p"))
    return prf(agg["g"], agg["p"], agg["c"])
