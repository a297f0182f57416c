"""Doc-shaped JSON emitter — the reference's API response format
(schema.py:44-100 Doc/Token/Morpheme pydantic models, serialized by the
six FastAPI endpoints at api_main.py:470-742) as plain dicts, with the
same verbosity ladder (schema.py:32-35 / api_main.py:562-567,691-719):

  verbosity 0 (BASIC)     final labels only
  verbosity 1 (INTERMID)  + intermediate predictions (nemo_multi,
                          morph-level nemo_multi_align_morph)
  verbosity 2 (SYNTAX)    + morpheme id/lemma/pos/feats and dependency
                          info (head, deprel) — the add_dep_info zip
                          (api_main.py:338-351)

``include_yap_outputs`` attaches the ma/pruned/md lattice TSV blocks
(api_main.py:593-596 analog; our analyzer is the in-process rule table,
engine/ops/lattice.py).

This is a FORMAT surface, not a service: the engine is a batch system
(queries() is the callable surface), so the emitter is a pure function
suitable for map_batches. One turn -> one Doc dict.
"""

from __future__ import annotations

from .kgflow import SentenceProcessor, scenario_mentions
from .ops.lattice import (build_sentence_lattice, dep_info, md_select_edges,
                          prune_lattice)


def to_doc(text: str, sp: SentenceProcessor, verbosity: int = 0,
           include_lattices: bool = False) -> dict:
    """One transcript turn -> one Doc-shaped dict."""
    rec = sp.process(text, with_dep=verbosity >= 2)
    tokens = rec["tokens"]
    n = len(tokens)

    # morpheme rows with attributes come from the chosen MD path edges
    if "'" in text:
        lattice = build_sentence_lattice(tokens)
        pruned = prune_lattice(lattice, rec["labels_multi"])
        md_edges = md_select_edges(pruned, sp.md_variant)
    else:
        lattice, pruned = None, None
        md_edges = build_sentence_lattice(tokens)  # trivial 1-edge tokens

    morph_rows = []
    for i, e in enumerate(md_edges):
        m: dict = {"form": e.form, "token_id": e.token_id}
        if rec["labels_morph"]:
            m["nemo_morph"] = rec["labels_morph"][i]
        if verbosity >= 1 and rec["labels_multi_align"]:
            m["nemo_multi_align_morph"] = rec["labels_multi_align"][i]
        if verbosity >= 2:
            m.update({"lemma": e.lemma, "pos": e.upos, "feats": e.feats})
        morph_rows.append(m)
    if verbosity >= 2 and rec["dep_info"]:
        for m, (mid, head, rel) in zip(morph_rows, rec["dep_info"]):
            m.update({"id": mid, "head": head, "deprel": rel})

    token_objs = []
    for i in range(n):
        t: dict = {"text": tokens[i]}
        if rec["labels_single"]:
            t["nemo_single"] = rec["labels_single"][i]
        if verbosity >= 1:
            t["nemo_multi"] = rec["labels_multi"][i]
        if rec["labels_tok_from_morph"]:
            t["nemo_morph_align_token"] = rec["labels_tok_from_morph"][i]
        t["morphs"] = [m for m in morph_rows if m["token_id"] == i + 1]
        token_objs.append(t)

    ents = {
        level: [
            {"surface": s, "label": lab, "start": st, "end": en, "occ": occ}
            for s, lab, st, en, occ in ml
        ]
        for level, ml in scenario_mentions(rec).items() if ml
    }

    doc: dict = {"text": text, "tokens": token_objs, "ents": ents}
    if include_lattices and lattice is not None:
        from .sources import lattice_to_tsv

        doc["ma_lattice"] = lattice_to_tsv(lattice)
        doc["pruned_lattice"] = lattice_to_tsv(pruned)
        doc["md_lattice"] = lattice_to_tsv(md_edges)
    if verbosity >= 2:
        doc["dep_tree"] = "\n".join(
            f"{m['id']}\t{m['form']}\t{m.get('lemma', '_')}\t"
            f"{m.get('pos', '_')}\t{m['head']}\t{m['deprel']}"
            for m in morph_rows if "id" in m
        )
    return doc


class DocJsonStage:
    """Actor stage: transcript turns in, JSON Doc strings out (one per
    turn) — the batch analog of a verbosity-parameterized endpoint."""

    def __init__(self, verbosity: int = 0, include_lattices: bool = False,
                 md_variant: str = "joint") -> None:
        # md_variant="md" mirrors the reference API route's standalone
        # MD (api_main.py:133-137); the default stays the CLI's joint
        self.sp = SentenceProcessor(md_variant=md_variant)
        self.verbosity = verbosity
        self.include_lattices = include_lattices

    def __call__(self, df):
        import json

        df = df.copy()
        df["doc_json"] = [
            json.dumps(to_doc(t, self.sp, self.verbosity,
                              self.include_lattices), sort_keys=True)
            for t in df["text"]
        ]
        return df[["conv_id", "turn_idx", "doc_json"]]
