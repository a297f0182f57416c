"""Mention state machine + occ multiset semantics
(ne_evaluate_mentions.py:84-144) and the P/R harness."""

import pyarrow as pa

from engine.eval import evaluate_tables, prf
from engine.ops.spans import mentions_with_occ, parse_spans


def test_parse_spans_state_machine():
    toks = ["a", "b", "c", "d", "e"]
    assert parse_spans(toks, ["S-PER", "O", "B-ORG", "I-ORG", "E-ORG"]) == [
        ("a", "PER", 0, 1), ("c d e", "ORG", 2, 5),
    ]
    # malformed spans drop: dangling B, orphan E, I without open span
    assert parse_spans(toks, ["B-PER", "O", "E-PER", "I-ORG", "O"]) == []
    # O inside a span aborts it
    assert parse_spans(toks, ["B-PER", "O", "I-PER", "E-PER", "O"]) == []
    # a new B restarts the span
    assert parse_spans(toks, ["B-PER", "B-PER", "E-PER", "O", "O"]) == [
        ("b c", "PER", 1, 3),
    ]
    # S closes any open span without emitting it
    assert parse_spans(toks, ["B-PER", "S-GPE", "E-PER", "O", "O"]) == [
        ("b", "GPE", 1, 2),
    ]


def test_occ_multiset_index():
    toks = ["x", "x", "x"]
    tags = ["S-PER", "S-PER", "S-ORG"]
    assert mentions_with_occ(toks, tags) == [
        ("x", "PER", 0, 1, 1), ("x", "PER", 1, 2, 2), ("x", "ORG", 2, 3, 1),
    ]


def test_prf_sentinels():
    assert prf(0, 0, 0) == (-1.0, -1.0, -1.0)
    assert prf(4, 2, 2) == (1.0, 0.5, 2 * 1.0 * 0.5 / 1.5)


def test_evaluate_tables_multiset():
    cols = ["sent_id", "surface", "label", "occ"]
    gold = pa.table(
        {"sent_id": [1, 1, 2], "surface": ["a", "a", "b"],
         "label": ["PER", "PER", "ORG"], "occ": [1, 2, 1]}
    )
    pred = pa.table(
        {"sent_id": [1, 1, 2], "surface": ["a", "a", "b"],
         "label": ["PER", "PER", "ORG"], "occ": [1, 2, 1]}
    )
    assert evaluate_tables(gold, pred, cols) == (1.0, 1.0, 1.0)
    pred2 = pa.table(
        {"sent_id": [1, 2], "surface": ["a", "b"],
         "label": ["PER", "ORG"], "occ": [1, 1]}
    )
    p, r, f = evaluate_tables(gold, pred2, cols)
    assert p == 1.0 and r == 2 / 3


def test_truncate_mentions_o5():
    """O5: islice-truncation semantics — a span cut by the boundary is
    dropped (its E is never seen), whole spans inside the window keep
    their occ indices."""
    from engine.ops.spans import mentions_with_occ, truncate_mentions

    toks = ["Alice", "met", "Tel", "Aviv", "crew"]
    tags = ["S-PER", "O", "B-GPE", "E-GPE", "O"]
    full = mentions_with_occ(toks, tags)
    assert truncate_mentions(toks, tags, None) == full
    assert truncate_mentions(toks, tags, 5) == full
    # boundary cuts the GPE span: only the S-PER survives
    assert truncate_mentions(toks, tags, 3) == [("Alice", "PER", 0, 1, 1)]
    assert truncate_mentions(toks, tags, 0) == []
