"""Label/morpheme alignment operators.

  soft_merge_bio_labels   semantics of nemo.py:117-137 (and the copy at
                          api_main.py:227-249): 1:N positional join of a
                          token's ^-joined multi-label atoms onto that
                          token's N morphemes, with the exact 3-case
                          length-mismatch policy:
                            case 1  len(forms) == len(atoms): zip
                            case 2  forms > atoms: pad the HEAD with 'O',
                                    align atoms from the right
                            case 3  atoms > forms: keep the atom TAIL,
                                    aligned from the right
  morph_to_token_align    semantics of nemo.py:217-226 + api_main.py:354-362:
                          group per-morpheme labels by token, '^'.join,
                          then fix to a single token tag via the
                          validate/fix chain (engine.ops.labels).

Both are per-sentence folds over co-ordered lists — in the Ray pipeline
they run inside ``map_batches`` on the same row, no shuffle (the
reference guarantees co-ordering by synchronous sequential execution;
we guarantee it by carrying morphs/labels as list columns of one row —
SURVEY.md section 2.9).
"""

from __future__ import annotations

from .labels import get_fixed_bio_sequence


def soft_merge_bio_labels(
    multi_labels: list[str], morphs: list[tuple[str, int]]
) -> list[tuple[str, str]]:
    """multi_labels: one ^-joined tag per token (1-based token order).
    morphs: [(form, token_id), ...] in sentence order.
    Returns [(form, bio), ...] per morpheme."""
    forms_by_tok: dict[int, list[str]] = {}
    for form, tid in morphs:
        forms_by_tok.setdefault(tid, []).append(form)
    out: list[tuple[str, str]] = []
    for tid in sorted(forms_by_tok):
        forms = forms_by_tok[tid]
        bio = multi_labels[tid - 1].split("^")
        if len(forms) == len(bio):
            merged = list(zip(forms, bio))
        elif len(forms) > len(bio):
            dif = len(forms) - len(bio)
            merged = list(zip(forms[:dif], ["O"] * dif)) + list(
                zip(forms[::-1], bio[::-1])
            )[::-1]
        else:
            merged = list(zip(forms[::-1], bio[::-1]))[::-1]
        out.extend(merged)
    return out


def morph_to_token_align(
    morph_labels: list[str], morphs: list[tuple[str, int]], n_tokens: int
) -> list[str]:
    """Per-morpheme labels -> one fixed tag per token. Morphemes of a
    token never cross rows, so this is a per-row fold (SURVEY.md J6)."""
    by_tok: dict[int, list[str]] = {}
    for (form, tid), lab in zip(morphs, morph_labels):
        by_tok.setdefault(tid, []).append(lab)
    return [
        get_fixed_bio_sequence(tuple(by_tok.get(tid, ["O"])))
        for tid in range(1, n_tokens + 1)
    ]
