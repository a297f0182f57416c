"""Morphological lattice operators.

Replaces the reference's external YAP analyzer (invoked at
nemo.py:229-244 / api_main.py:98-130) with an in-process deterministic
rule-table analyzer, and re-implements the reference's signature hybrid
step — NER-predicted morpheme counts PRUNE the ambiguous lattice before
disambiguation:

  get_valid_edges   semantics of nemo.py:78-97  (path enumeration with
                    length == biose_count+1, non_o_only short-circuit,
                    keep_all_if_no_valid fallback)
  prune_lattice     semantics of nemo.py:108-114 (semi-join on
                    (token_id, id1, id2) edge membership)
  md_select         deterministic stand-in for YAP joint/MD
                    (nemo.py:238-244): picks ONE path per token.

Everything is per-sentence/per-token — a lattice never crosses a row, so
in the Ray pipeline these run inside ``map_batches`` with no shuffle
(SURVEY.md J1-J2).

Rule tables (drive the synthetic morphology — engine.synth fuses
prefixes onto surface forms with an apostrophe):

  MA_PREFIXES      prefixes the analyzer can split off.
  MANDATORY_SPLIT  prefixes that, as the token's first part, remove the
                   whole-token edge (the token MUST segment) — the
                   definite-article analog.
  (The token-multi scorer knows only MULTI_PREFIXES, a strict subset —
  see engine.scorers — so count mispredictions occur deterministically
  and exercise the keep_all_if_no_valid fallback and all three
  soft-merge cases, like real model errors do in the reference.)
"""

from __future__ import annotations

from dataclasses import dataclass

MA_PREFIXES = frozenset({"be", "le", "ve", "mi", "she", "ha"})
MANDATORY_SPLIT = frozenset({"ha"})


@dataclass(frozen=True)
class Edge:
    id1: int
    id2: int
    form: str
    token_id: int  # 1-based, as in the reference lattices
    # morpheme attributes (reference schema.py:44-57 Morpheme fields;
    # 8-col lattice TSV cols 4-7) — filled by the analyzer's
    # deterministic rule (morph_attrs), defaults keep bare
    # positional construction working
    lemma: str = ""
    upos: str = ""
    xpos: str = ""
    feats: str = "_"


def morph_attrs(form: str, is_prefix: bool, definite: bool = False
                ) -> tuple[str, str, str, str]:
    """Deterministic (lemma, upos, xpos, feats) for one morpheme — the
    analyzer-side analog of YAP's MA columns (the reference reads them
    from the external analyzer's 8-col TSV, nemo.py:100-105):
      prefixes   lemma=form, ADP/PREF, feats marks prefix status
      cores      lemma = apostrophe-stripped lowercase, PROPN when
                 capitalized else NOUN; Definite=Def when the token
                 carried a mandatory-split (definite-article) prefix."""
    if is_prefix:
        return form, "ADP", "PREF", "Prefix=Yes"
    lemma = form.replace("'", "").lower()
    upos = "PROPN" if form[:1].isupper() else "NOUN"
    feats = "Definite=Def" if definite else "_"
    return lemma, upos, upos, feats


def candidate_segmentations(token: str) -> list[list[str]]:
    """All candidate morpheme sequences for one surface token.

    parts = token split on apostrophes; depth-d candidate splits off the
    first d parts (each must be in MA_PREFIXES); depth 0 = whole token,
    absent when the first part is in MANDATORY_SPLIT.
    """
    parts = token.split("'")
    cands: list[list[str]] = []
    if len(parts) == 1 or parts[0] not in MANDATORY_SPLIT:
        cands.append([token])
    if len(parts) > 1:
        for d in range(1, len(parts)):
            if all(p in MA_PREFIXES for p in parts[:d]):
                cands.append(parts[:d] + ["'".join(parts[d:])])
            else:
                break
    if not cands:  # mandatory-split first part that is somehow unsplittable
        cands.append([token])
    return cands


def build_sentence_lattice(tokens: list[str]) -> list[Edge]:
    """Ambiguous lattice for one sentence as a flat edge list with
    per-sentence node numbering (the Arrow list<struct> analog of the
    8-col TSV at nemo.py:100-105). All candidates of a token share its
    start and end node; intermediates are unique per candidate."""
    edges: list[Edge] = []
    node = 0
    for tid, token in enumerate(tokens, start=1):
        cands = candidate_segmentations(token)
        n_intermediate = sum(len(c) - 1 for c in cands)
        start, end = node, node + n_intermediate + 1
        inter = start + 1
        definite = token.split("'")[0] in MANDATORY_SPLIT
        for cand in cands:
            prev = start
            for i, form in enumerate(cand):
                last = i == len(cand) - 1
                nxt = end if last else inter
                if not last:
                    inter += 1
                lemma, upos, xpos, feats = morph_attrs(
                    form, is_prefix=not last, definite=definite and last)
                edges.append(Edge(prev, nxt, form, tid,
                                  lemma=lemma, upos=upos, xpos=xpos,
                                  feats=feats))
                prev = nxt
        node = end
    return edges


def _paths(edges: list[Edge]) -> list[list[Edge]]:
    """All simple source->sink paths through one token's tiny DAG.
    min node = first edge's id1, max node = last edge's id2 (mirrors the
    groupby-first/last convention at nemo.py:83-84)."""
    if not edges:
        return []
    src, sink = edges[0].id1, edges[-1].id2
    adj: dict[int, list[Edge]] = {}
    for e in edges:
        adj.setdefault(e.id1, []).append(e)
    out: list[list[Edge]] = []
    stack: list[tuple[int, list[Edge]]] = [(src, [])]
    while stack:
        n, path = stack.pop()
        if n == sink:
            out.append(path)
            continue
        for e in adj.get(n, []):
            stack.append((e.id2, path + [e]))
    out.sort(key=lambda p: tuple(e.form for e in p))
    return out


def get_valid_edges(
    token_edges: dict[int, list[Edge]],
    biose: list[str],
    counts: list[int],
    non_o_only: bool = False,
    keep_all_if_no_valid: bool = True,
) -> set[tuple[int, int, int]]:
    """Per token: keep edges on paths whose morpheme count matches the
    NER-predicted biose_count (path node count == biose_count+1, i.e.
    edge count == biose_count). Tokens whose multi-tag carries no
    category are unconstrained when non_o_only=True; if no path matches
    and keep_all_if_no_valid, every path is kept (nemo.py:78-97)."""
    valid: set[tuple[int, int, int]] = set()
    for tid, edges in token_edges.items():
        tag, cnt = biose[tid - 1], counts[tid - 1]
        paths = _paths(edges)
        if non_o_only and "-" not in tag:
            keep = paths
        else:
            keep = [p for p in paths if len(p) == cnt]
            if keep_all_if_no_valid and not keep:
                keep = paths
        for p in keep:
            for e in p:
                valid.add((tid, e.id1, e.id2))
    return valid


def group_edges_by_token(edges: list[Edge]) -> dict[int, list[Edge]]:
    out: dict[int, list[Edge]] = {}
    for e in edges:
        out.setdefault(e.token_id, []).append(e)
    return out


def prune_lattice(
    edges: list[Edge],
    multi_labels: list[str],
    keep_all_if_no_valid: bool = True,
) -> list[Edge]:
    """Semi-join: keep lattice edges in the valid-edge set derived from
    the token-multi NER prediction (nemo.py:108-114; counts per
    nemo.py:66-75 = len(tag.split('^')))."""
    counts = [len(t.split("^")) for t in multi_labels]
    by_tok = group_edges_by_token(edges)
    valid = get_valid_edges(by_tok, multi_labels, counts, non_o_only=False,
                            keep_all_if_no_valid=keep_all_if_no_valid)
    return [e for e in edges if (e.token_id, e.id1, e.id2) in valid]


def md_select_edges(edges: list[Edge], variant: str = "joint") -> list[Edge]:
    """md_select returning the full Edge objects of the chosen path
    (carrying the analyzer's lemma/upos/xpos/feats attributes).

    variant distinguishes the reference's two MD routes — its own TODO
    (api_main.py:133-137) flags that the API calls standalone YAP `md`
    where the CLI flagship uses `joint`:
      "joint"  (default, the CLI/nemo.py:238-244 route): most-split
               path, tie-broken by lexicographically smallest form
               sequence — syntax-pressured decodes favor segmentation.
      "md"     (the API route): FEWEST-split path, same tie-break —
               standalone MD without syntactic pressure favors the
               surface form. Both are deterministic stand-ins for
               YAP's scored decodes."""
    if variant not in ("joint", "md"):
        raise ValueError(f"unknown md variant: {variant!r}")
    out: list[Edge] = []
    for tid, tok_edges in sorted(group_edges_by_token(edges).items()):
        paths = _paths(tok_edges)  # lex-sorted by forms
        if variant == "joint":
            best = max(paths, key=len)   # first (lex-smallest) among longest
        else:
            best = min(paths, key=len)   # first (lex-smallest) among shortest
        out.extend(best)
    return out


def md_select(edges: list[Edge], variant: str = "joint"
              ) -> list[tuple[str, int]]:
    """Morphological disambiguation: ONE path per token from the (pruned)
    lattice. Deterministic policy (stand-in for YAP's scored joint
    decode, nemo.py:238-244). Returns [(form, token_id), ...] in
    sentence order. See md_select_edges for the joint-vs-md variant
    distinction."""
    return [(e.form, e.token_id) for e in md_select_edges(edges, variant)]


def dep_info(morphs: list[tuple[str, int]]) -> list[tuple[int, int, str]]:
    """Deterministic dependency info per MD morpheme — the engine's J9
    analog of api_main.py:338-351 (which zips the external parser's
    (id, head, deprel) columns onto morphemes in MD order). Rule:
    morpheme ids are 1-based MD order; each token's LAST morpheme is
    its core; prefix morphemes attach to their token's core with
    deprel 'case'; cores chain to the previous token's core with
    deprel 'dep'; the first token's core is the root (head 0).
    Returns [(id, head, deprel)] aligned with ``morphs``."""
    # core id per token = id of the token's last morpheme
    core_of: dict[int, int] = {}
    for i, (_form, tid) in enumerate(morphs, start=1):
        core_of[tid] = i
    out: list[tuple[int, int, str]] = []
    prev_core = 0
    seen_tokens: list[int] = []
    for i, (_form, tid) in enumerate(morphs, start=1):
        if i == core_of[tid]:
            if not seen_tokens or seen_tokens[-1] != tid:
                seen_tokens.append(tid)
            if len(seen_tokens) == 1:
                out.append((i, 0, "root"))
            else:
                out.append((i, prev_core, "dep"))
            prev_core = i
        else:
            out.append((i, core_of[tid], "case"))
    return out


def analyze_prune_md(
    tokens: list[str], multi_labels: list[str], variant: str = "joint"
) -> tuple[list[Edge], list[Edge], list[tuple[str, int]]]:
    """Full morph track for one sentence: MA -> prune -> MD.
    Returns (ambiguous lattice, pruned lattice, morphemes)."""
    lat = build_sentence_lattice(tokens)
    pruned = prune_lattice(lat, multi_labels)
    return lat, pruned, md_select(pruned, variant)
