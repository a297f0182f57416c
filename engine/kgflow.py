"""Shared pure flow logic: per-sentence processing (the reference's five
CLI scenarios, nemo.py:433-464) and per-conversation linking + relation
extraction (the KG generalization required by the north rule).

Both the distributed Ray pipeline (engine.pipeline) and the
single-process oracle (engine.oracle) call exactly these functions; the
oracle-vs-distributed comparison therefore validates the distributed
dataflow (ordering, shuffles, alignment, dedup), not the math.

Scenario map (reference -> produced labels, all per turn):
  token_single          run_ner_model single        nemo.py:433-436
  multi_align           token-multi soft-merged onto pruned-MD morphemes
                        (run_multi_align_hybrid)    nemo.py:278-312
  morph_yap             morph NER on unpruned MD    nemo.py:276-305
  morph_hybrid          morph NER on NER-pruned MD  nemo.py:315-373
  morph_hybrid_tok      morph_hybrid aligned back to tokens
                        (align_tokens=True path)    nemo.py:353-362
"""

from __future__ import annotations

from .ops.align import morph_to_token_align, soft_merge_bio_labels
from .ops.lattice import (build_sentence_lattice, dep_info, md_select,
                          prune_lattice)
from .ops.spans import mentions_with_occ
from .ops.tokenize import tokenize
from .scorers import RELATIONS, MorphScorer, TokenMultiScorer, TokenSingleScorer

# relation phrases ordered: longest first, then lexicographic — the scan
# below is first-match-wins, so this order is part of the semantics
_REL_ORDER = sorted(RELATIONS, key=lambda p: (-len(p), p))
MAX_REL_GAP = 4

SCENARIOS = ("token_single", "multi_align", "morph_yap", "morph_hybrid", "morph_hybrid_tok")


class SentenceProcessor:
    """Holds the three scorers; lives in a Ray actor's __init__ so state
    is built once per worker (A1-A4 analog)."""

    def __init__(self, md_variant: str = "joint") -> None:
        self.single = TokenSingleScorer()
        self.multi = TokenMultiScorer()
        self.morph = MorphScorer()
        # "joint" = the CLI flagship route (nemo.py:238-244), "md" = the
        # API route's standalone MD (api_main.py:133-137 TODO flags the
        # divergence in the reference itself) — see md_select_edges
        self.md_variant = md_variant

    def process(self, text: str, levels: tuple[str, ...] = SCENARIOS,
                with_dep: bool = False) -> dict:
        """Per-sentence chain; ``levels`` prunes scenario work the caller
        doesn't consume (the KG track needs only morph_hybrid +
        multi_align — skipping token-single scoring and the un-pruned
        morph_yap decode saves ~1/3 of per-turn compute). Values for a
        requested level are identical whatever other levels are on."""
        tokens = tokenize(text)
        lv = set(levels)
        labels_multi = self.multi.label(tokens)

        if "'" not in text:
            # exact fast path: no fused token -> every token has exactly
            # one single-morpheme candidate (candidate_segmentations
            # returns [[token]]), every multi-tag has one atom, pruning
            # keeps the only path and MD returns the tokens unchanged.
            morphs = [(tok, i) for i, tok in enumerate(tokens, start=1)]
            forms = tokens
            lattice = None
        else:
            lattice = build_sentence_lattice(tokens)
            pruned = prune_lattice(lattice, labels_multi)
            # [(form, token_id)] hybrid track, joint- or md-variant decode
            morphs = md_select(pruned, self.md_variant)
            forms = [f for f, _ in morphs]

        labels_single = self.single.label(tokens) if "token_single" in lv else []
        if "morph_yap" in lv:
            morphs_yap = (morphs if lattice is None
                          else md_select(lattice, self.md_variant))
            labels_morph_yap = self.morph.label([f for f, _ in morphs_yap])
        else:
            morphs_yap, labels_morph_yap = [], []
        need_morph = lv & {"morph_hybrid", "morph_hybrid_tok"}
        labels_morph = self.morph.label(forms) if need_morph else []
        labels_multi_align = (
            [b for _, b in soft_merge_bio_labels(labels_multi, morphs)]
            if "multi_align" in lv else []
        )
        labels_tok = (
            morph_to_token_align(labels_morph, morphs, len(tokens))
            if "morph_hybrid_tok" in lv else []
        )

        rec_dep = dep_info(morphs) if with_dep else []
        return {
            "tokens": tokens,
            "dep_info": rec_dep,  # [(id, head, deprel)] per MD morpheme (J9)
            "labels_single": labels_single,
            "labels_multi": labels_multi,
            "morph_forms": forms,
            "morph_token_ids": [t for _, t in morphs],
            "yap_forms": [f for f, _ in morphs_yap],
            "labels_morph": labels_morph,
            "labels_morph_yap": labels_morph_yap,
            "labels_multi_align": labels_multi_align,
            "labels_tok_from_morph": labels_tok,
        }


def scenario_mentions(rec: dict, levels: tuple[str, ...] = SCENARIOS
                      ) -> dict[str, list[tuple[str, str, int, int, int]]]:
    """Per scenario: [(surface, label, start, end, occ)] for one turn."""
    src = {
        "token_single": ("tokens", "labels_single"),
        "multi_align": ("morph_forms", "labels_multi_align"),
        "morph_yap": ("yap_forms", "labels_morph_yap"),
        "morph_hybrid": ("morph_forms", "labels_morph"),
        "morph_hybrid_tok": ("tokens", "labels_tok_from_morph"),
    }
    return {
        lvl: mentions_with_occ(rec[src[lvl][0]], rec[src[lvl][1]])
        for lvl in levels
    }


def kg_mentions(rec: dict) -> list[tuple[str, str, int, int, int]]:
    """Mentions feeding the KG track: the morph_hybrid scenario, plus
    multi_align mentions whose spans don't overlap any hybrid mention
    (both live in morph-form coordinates). The extras carry opaque fused
    surfaces like "xa'Paris" that only the union-find canonicalization
    (skeleton bridge -> gpe:paris) can resolve — this is where the
    hybrid's two tracks genuinely complement each other. occ is
    recomputed over the merged list."""
    ments = scenario_mentions(rec, ("morph_hybrid", "multi_align"))
    base = ments["morph_hybrid"]
    taken = [(st, en) for _s, _l, st, en, _o in base]
    merged = list(base)
    for m in ments["multi_align"]:
        _s, _l, st, en, _o = m
        if all(en <= bst or st >= ben for bst, ben in taken):
            merged.append(m)
    merged.sort(key=lambda m: (m[2], m[3]))
    seen: dict[tuple[str, str], int] = {}
    out = []
    for surface, label, start, end, _occ in merged:
        key = (surface, label)
        seen[key] = seen.get(key, 0) + 1
        out.append((surface, label, start, end, seen[key]))
    return out


def relation_candidates(
    forms: list[str], ments: list[tuple[str, str, int, int, int]]
) -> list[tuple[int, str, int]]:
    """Intra-turn relation detection between ADJACENT mention pairs: scan
    the lowercased morpheme gap (<= MAX_REL_GAP) left-to-right; at each
    position try phrases longest-first; first match wins. Returns
    [(left_mention_index, predicate, right_mention_index)]."""
    out = []
    for i in range(len(ments) - 1):
        _s1, _l1, _st1, end1, _o1 = ments[i]
        _s2, _l2, st2, _e2, _o2 = ments[i + 1]
        gap = [f.lower() for f in forms[end1:st2]]
        if not gap or len(gap) > MAX_REL_GAP:
            continue
        pred = None
        for pos in range(len(gap)):
            for phrase in _REL_ORDER:
                if tuple(gap[pos : pos + len(phrase)]) == phrase:
                    pred = RELATIONS[phrase]
                    break
            if pred:
                break
        if pred:
            out.append((i, pred, i + 1))
    return out


def resolve_entries(entries: list[tuple], emit_entities: bool = True
                    ) -> tuple[list[dict], list[dict]]:
    """Conversation-scoped entity linking + triple emission over a
    whole BUCKET of turn entries in one call.

    ``entries``: [(conv_id, turn_idx, sent_id, mentions, rels)] sorted
    by (conv_id, turn_idx); mentions are morph_hybrid-level
    [(surface, label, start, end, occ)], rels are [(i, pred, j)].

    Linking walk (deterministic, ORDER-DEPENDENT — this is why the
    groupby(conv_id)+sort(turn_idx) reassembly shuffle exists): an
    ambiguous alias resolves to the candidate canon seen EARLIEST so far
    in this conversation, else to the lexicographically-smallest
    candidate; unknown surfaces get a nil key (engine.link). The
    per-conversation ``seen`` state resets inline on conv_id change —
    one call per bucket instead of one flush per conversation
    (VERDICT r3 #6: the per-conversation closure + per-call imports
    were ~40% of the resolve wall at 39k conversations/bucket).

    Returns (entity rows, triple rows). Triple subj/obj are canon ids.
    """
    from .link import ALIAS_INDEX, nil_key

    alias_get = ALIAS_INDEX.get
    seen: dict[str, int] = {}
    entities: list[dict] = []
    triples: list[dict] = []
    cur = None
    for conv_id, turn_idx, sent_id, ments, rels in entries:
        if conv_id != cur:
            seen = {}
            cur = conv_id
        canons: list[str] = []
        for surface, label, start, end, occ in ments:
            cands = alias_get(surface.lower())
            if not cands:
                canon = nil_key(surface)
                score = 0.0
            elif len(cands) == 1:
                canon, score = cands[0], 1.0
            else:
                seen_cands = [c for c in cands if c in seen]
                if seen_cands:
                    canon = min(seen_cands, key=lambda c: seen[c])
                else:
                    canon = cands[0]
                score = 0.9
            if canon not in seen and not canon.startswith("nil:"):
                seen[canon] = len(seen)
            canons.append(canon)
            if emit_entities:
                entities.append(
                    {
                        "mention_id": f"{sent_id}:{start}",
                        "conv_id": conv_id,
                        "turn_idx": turn_idx,
                        "surface": surface,
                        "label": label,
                        "canon_id": canon,
                        "score": score,
                    }
                )
        for i, pred, j in rels:
            triples.append(
                {
                    "subj": canons[i],
                    "pred": pred,
                    "obj": canons[j],
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                }
            )
    return entities, triples


def resolve_conversation(turns: list[dict], emit_entities: bool = True
                         ) -> tuple[list[dict], list[dict]]:
    """Single-conversation wrapper over resolve_entries (the oracle's
    entry point; ``turns``: per-turn dicts sorted by turn_idx). One
    shared walk implementation — the distributed bucket path and the
    oracle cannot drift."""
    return resolve_entries(
        [(t["conv_id"], t["turn_idx"], t["sent_id"], t["mentions"],
          t["rels"]) for t in turns],
        emit_entities=emit_entities,
    )
