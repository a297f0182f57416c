"""Single-process pure-Python oracle (SURVEY.md section 5, FIXTURES.md F4).

Runs the identical deterministic operator chain as the distributed
pipeline — same functions from engine.kgflow / engine.link /
engine.canon — but sequentially over a pyarrow Table, with plain loops
and a local union-find. pytest compares the distributed output against
this oracle with the reference's multiset P/R discipline
(ne_evaluate_mentions.py:53-81) expecting P=R=1.0.
"""

from __future__ import annotations

import pyarrow as pa

from .canon import local_components
from .kgflow import (SentenceProcessor, kg_mentions, relation_candidates,
                     resolve_conversation, scenario_mentions)
from .link import STATIC_CANON_EDGES, nil_edges, resolve_component_root
from .schema import stable_sent_id


def run_oracle(transcripts: pa.Table) -> dict[str, pa.Table]:
    """Returns {"mentions": Table, "entities": Table, "triples": Table}.

    mentions: one row per (turn, scenario, mention) with occ index.
    triples: exact-deduped on (subj, pred, obj), provenance = min
    (conv_id, turn_idx) (SURVEY.md D4), canon ids resolved through the
    union-find canonicalization.
    """
    sp = SentenceProcessor()
    rows = sorted(
        transcripts.to_pylist(), key=lambda r: (r["conv_id"], r["turn_idx"])
    )

    mention_rows: list[dict] = []
    conv_turns: dict[str, list[dict]] = {}
    for r in rows:
        rec = sp.process(r["text"])
        sid = stable_sent_id(r["conv_id"], r["turn_idx"])
        ments = scenario_mentions(rec)
        for level, ml in ments.items():
            for surface, label, start, end, occ in ml:
                mention_rows.append(
                    {
                        "sent_id": sid,
                        "conv_id": r["conv_id"],
                        "turn_idx": r["turn_idx"],
                        "level": level,
                        "surface": surface,
                        "label": label,
                        "start": start,
                        "end": end,
                        "occ": occ,
                    }
                )
        conv_turns.setdefault(r["conv_id"], []).append(
            {
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                "sent_id": sid,
                "mentions": kg_mentions(rec),
                "rels": relation_candidates(rec["morph_forms"], kg_mentions(rec)),
            }
        )

    entity_rows: list[dict] = []
    triple_rows: list[dict] = []
    for conv_id in sorted(conv_turns):
        ents, trips = resolve_conversation(conv_turns[conv_id])
        entity_rows.extend(ents)
        triple_rows.extend(trips)

    # canonicalization: union-find over nil-key/skeleton/canon edges
    nil_keys = sorted(
        {e["canon_id"] for e in entity_rows if e["canon_id"].startswith("nil:")}
    )
    edges = STATIC_CANON_EDGES + nil_edges(nil_keys)
    roots = local_components(edges)
    mapping = {
        k: resolve_component_root(roots.get("n:" + k, "n:" + k))
        for k in nil_keys
    }

    def canon(c: str) -> str:
        return mapping.get(c, c)

    for e in entity_rows:
        e["canon_id"] = canon(e["canon_id"])

    # exact triple dedup, min-provenance winner
    best: dict[tuple[str, str, str], tuple[str, int]] = {}
    for t in triple_rows:
        key = (canon(t["subj"]), t["pred"], canon(t["obj"]))
        prov = (t["conv_id"], t["turn_idx"])
        if key not in best or prov < best[key]:
            best[key] = prov
    triples = [
        {"subj": k[0], "pred": k[1], "obj": k[2], "conv_id": v[0], "turn_idx": v[1]}
        for k, v in sorted(best.items())
    ]

    from .schema import MENTIONS, TRIPLES

    return {
        "mentions": pa.Table.from_pylist(mention_rows, schema=MENTIONS),
        "entities": pa.Table.from_pylist(entity_rows),
        "triples": pa.Table.from_pylist(triples, schema=TRIPLES),
    }
