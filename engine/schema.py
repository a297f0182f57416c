"""Arrow schemas for every logical table in the engine.

Mirrors SURVEY.md section 1.2. The reference's nested Doc->Token->Morpheme
model (schema.py:44-100 in /root/reference) becomes flat sentence-keyed
tables with list/struct columns; lattices are list<struct> columns, never
TSV round-trips.
"""

from __future__ import annotations

import pyarrow as pa

# primary input — exact BASELINE.json input_hint shape
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# lattice edge struct — the 8-col TSV of nemo.py:100-105 as an Arrow struct
LATTICE_EDGE = pa.struct(
    [
        ("id1", pa.int32()),
        ("id2", pa.int32()),
        ("form", pa.string()),
        ("lemma", pa.string()),
        ("upos", pa.string()),
        ("xpos", pa.string()),
        ("feats", pa.string()),
        ("token_id", pa.int32()),
    ]
)

MORPH = pa.struct(
    [
        ("form", pa.string()),
        ("token_id", pa.int32()),
    ]
)

# morpheme + dependency info — the J9 verbosity-2 surface
# (api_main.py:338-351 zips (id, head, deprel) onto morphemes; reference
# schema.py:44-57 Morpheme carries them as optional fields)
DEP_MORPH = pa.struct(
    [
        ("id", pa.int32()),
        ("form", pa.string()),
        ("token_id", pa.int32()),
        ("head", pa.int32()),
        ("deprel", pa.string()),
    ]
)

DEP_TURNS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_id", pa.int64()),
        ("morphs", pa.list_(DEP_MORPH)),
    ]
)

MENTIONS = pa.schema(
    [
        ("sent_id", pa.int64()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("level", pa.string()),  # "token" | "morph"
        ("surface", pa.string()),
        ("label", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("occ", pa.int32()),  # multiset index per ne_evaluate_mentions.py:116-122
    ]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)


def stable_sent_id(conv_id: str, turn_idx: int) -> int:
    """Global stable sentence id: 64-bit FNV-1a of conv_id, shifted,
    plus turn_idx. Deterministic across processes (no PYTHONHASHSEED
    dependence), collision-safe in the low bits for turn_idx < 2^20."""
    h = 0xCBF29CE484222325
    for b in conv_id.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return ((h >> 1) & ~0xFFFFF) | (turn_idx & 0xFFFFF)
