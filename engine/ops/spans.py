"""Mention/span extraction with multiset occurrence indices.

  extract_mentions   semantics of ne_evaluate_mentions.py:84-144
                     (sent_to_mentions_dict + get_ment_set): a B..E/S
                     state machine over BIOSE tags; O and malformed
                     spans drop; the surface string is the join of the
                     member token surfaces; each (sent, surface, cat)
                     multiset entry gets occurrence index occ=1..n.
  parse_spans        positional spans {surface,label,start,end} like the
                     iobes parse at api_main.py:380-419.

The reference joins Hebrew surfaces with '' (str_join_char='',
ne_evaluate_mentions.py:45); our corpus is space-delimited so the
engine default is ' ' — configurable, applied identically in the
oracle.
"""

from __future__ import annotations


def parse_spans(tokens: list[str], tags: list[str]) -> list[tuple[str, str, int, int]]:
    """BIOSE tags -> [(surface, label, start, end)] with token offsets
    (end exclusive). Same accept/reject behavior as the mention state
    machine: S emits; B starts; I extends an open span; E closes and
    emits; O or a new B/S aborts an open span silently."""
    spans: list[tuple[str, str, int, int]] = []
    cur_start = None
    cur_cat = None
    for i, tag in enumerate(tags):
        parts = tag.split("-")
        bio = parts[0]
        cat = parts[1] if len(parts) > 1 else "_"
        if bio == "S":
            spans.append((tokens[i], cat, i, i + 1))
            cur_start = None
            cur_cat = None
        elif bio == "B":
            cur_start = i
            cur_cat = cat
        elif bio == "I":
            pass  # extends iff a span is open; position tracked by cur_start
        elif bio == "E":
            if cur_start is not None:
                spans.append((" ".join(tokens[cur_start : i + 1]), cur_cat, cur_start, i + 1))
            cur_start = None
            cur_cat = None
        else:  # O
            cur_start = None
            cur_cat = None
    return spans


def mentions_with_occ(
    tokens: list[str], tags: list[str], join_char: str = " "
) -> list[tuple[str, str, int, int, int]]:
    """[(surface, label, start, end, occ)] — occ is the per-(surface,label)
    multiset index within the sentence (ne_evaluate_mentions.py:116-122).

    Note the reference state machine appends I/E tokens to an open
    mention regardless of category and keeps the category of B
    (ne_evaluate_mentions.py:95-115); parse_spans reproduces that, and
    join_char reproduces str_join_char."""
    seen: dict[tuple[str, str], int] = {}
    out = []
    for surface, label, start, end in parse_spans(tokens, tags):
        if join_char != " " and " " in surface:
            surface = surface.replace(" ", join_char)
        key = (surface, label)
        seen[key] = seen.get(key, 0) + 1
        out.append((surface, label, start, end, seen[key]))
    return out


def truncate_mentions(
    tokens: list[str], tags: list[str], truncate: int | None,
    join_char: str = " ",
) -> list[tuple[str, str, int, int, int]]:
    """O5: the eval-side truncation (ne_evaluate_mentions.py:88-91
    ``islice(sent, truncate)``): mentions are extracted from only the
    first ``truncate`` positions — a span cut by the boundary drops,
    exactly as the reference's state machine never sees its E tag."""
    if truncate is None:
        return mentions_with_occ(tokens, tags, join_char)
    return mentions_with_occ(tokens[:truncate], tags[:truncate], join_char)
