"""Entity-linking candidate generation (SURVEY.md J11 — no reference
analog; the KG generalization required by the north rule).

The alias table is small (O(10^2) here, O(10^6) in production), so the
linking side is a broadcast: the index is module-level constant data
here; a production-sized table would be ``ray.put`` once and read in
each actor's ``__init__``. Large alias tables would instead shuffle-join
on norm_key (SURVEY.md J11 scale path).

Canonicalization namespaces (nodes of the connected-components graph,
engine.canon): "c:"+canon_id < "n:"+nil_key < "s:"+skeleton — the
min-label root of a component is therefore a canon whenever one is
reachable, so nil mentions that normalize to a known alias skeleton
collapse into the existing entity.
"""

from __future__ import annotations

from .ops.labels import normalize_word
from .ops.lattice import MA_PREFIXES
from .scorers import SCORER_PREFIXES, build_alias_index

ALIAS_INDEX: dict[str, list[str]] = build_alias_index()

_ALL_PREFIXES = MA_PREFIXES | SCORER_PREFIXES


def nil_key(surface: str) -> str:
    return "nil:" + surface.lower()


def skeleton(surface: str) -> str:
    """Normalization skeleton: per token strip leading fused prefixes
    (any analyzer- or scorer-known prefix), drop apostrophes, lowercase,
    normalize digits, drop non-alnum chars; single-space join."""
    toks = []
    for token in surface.split(" "):
        parts = token.split("'")
        d = 0
        while d < len(parts) - 1 and parts[d] in _ALL_PREFIXES:
            d += 1
        core = "".join(parts[d:])
        core = normalize_word(core.lower())
        core = "".join(ch for ch in core if ch.isalnum())
        if core:
            toks.append(core)
    return " ".join(toks)


def _unambiguous_alias_skeletons() -> dict[str, str]:
    """skeleton -> canon_id, only where the skeleton resolves to exactly
    one canon (ambiguous skeletons like 'stark' are excluded so
    components never merge two real entities)."""
    from .scorers import ENTITIES

    by_skel: dict[str, set[str]] = {}
    for canon_id, (_cat, aliases) in ENTITIES.items():
        for alias in aliases:
            by_skel.setdefault(skeleton(alias), set()).add(canon_id)
    return {s: next(iter(c)) for s, c in by_skel.items() if len(c) == 1}


ALIAS_SKELETONS: dict[str, str] = _unambiguous_alias_skeletons()

# static edges: unambiguous alias skeleton <-> its canon
STATIC_CANON_EDGES: list[tuple[str, str]] = [
    ("c:" + canon, "s:" + skel) for skel, canon in sorted(ALIAS_SKELETONS.items())
]


def nil_edges(nil_keys) -> list[tuple[str, str]]:
    """CC edges for nil mention keys: each nil key bridges to its
    skeleton node; keys sharing a skeleton merge, and if the skeleton is
    a known unambiguous alias the component root becomes that canon."""
    out = []
    for k in nil_keys:
        surf = k[len("nil:") :]
        out.append(("n:" + k, "s:" + skeleton(surf)))
    return out


def resolve_component_root(root: str) -> str:
    """Map a CC root label back to a canon id or a nil canon."""
    if root.startswith("c:"):
        return root[2:]
    if root.startswith("n:"):
        return root[2:]
    return "nil:" + root[2:]  # bare skeleton component (no nil/canon member)
