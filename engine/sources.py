"""Sources/sinks for the reference's interchange formats (SURVEY.md
S1-S8) — used for golden-fixture tests and for importing/exporting
corpora in the reference's shapes; the engine's own stages never
round-trip text formats (lattices/labels stay Arrow columns).

  read_labeled_conll / write_labeled_conll
      the 'token SP label' + blank-line-between-sentences format of
      nemo.py:34-49 / ne_evaluate_mentions.py:27-42, with '#'-comment
      skipping and the optional multi-tag fix.
  lattice_to_tsv / tsv_to_lattice
      the 8-column lattice TSV blocks of nemo.py:100-105.
  read_transcripts_any
      parquet/csv/json transcript readers normalized to the
      TRANSCRIPTS schema.
"""

from __future__ import annotations

import pyarrow as pa

from .ops.labels import fix_multi_biose
from .ops.lattice import Edge


def read_labeled_conll(text: str, comment_prefix: str = "#",
                       field_delim: str = " ", multi_delim: str = "^",
                       fix_multi_tag: bool = True,
                       sent_id_shift: int = 0) -> list[tuple[int, list[tuple[str, str]]]]:
    """-> [(sent_id, [(token, tag), ...])]; sentences split on blank
    lines, comment lines skipped, tag = last field."""
    sents = []
    for i, block in enumerate(text.split("\n\n")):
        if not block:
            continue
        cur = []
        for line in block.split("\n"):
            if not line or line.startswith(comment_prefix):
                continue
            ls = line.split(field_delim)
            tok, tag = ls[0], ls[-1]
            if fix_multi_tag and multi_delim in tag:
                tag = fix_multi_biose(tag, multi_delim)
            cur.append((tok, tag))
        if cur:
            sents.append((i + sent_id_shift, cur))
    return sents


def write_labeled_conll(sents, dummy_o: bool = False,
                        only_tokens: bool = False) -> str:
    """[(token, tag)] lists -> the reference's token-file text
    (semantics of nemo.py:34-49 incl. dummy_o / only_tokens modes)."""
    out = []
    for sent in sents:
        for fields in sent:
            word = fields if isinstance(fields, str) else fields[0]
            if only_tokens:
                out.append(word)
            elif dummy_o:
                out.append(f"{word} O")
            else:
                out.append(f"{word} {fields[-1]}")
        out.append("")
    return "\n".join(out) + "\n"


def lattice_to_tsv(edges: list[Edge]) -> str:
    """Edge list -> 8-col TSV block (ID1 ID2 form lemma upos xpos feats
    token_id), one sentence. Attribute columns come from the edge's
    analyzer-filled morph attrs (ops/lattice.morph_attrs), not faked."""
    lines = [
        f"{e.id1}\t{e.id2}\t{e.form}\t{e.lemma or e.form}\t"
        f"{e.upos or 'X'}\t{e.xpos or 'X'}\t{e.feats or '_'}\t{e.token_id}"
        for e in edges
    ]
    return "\n".join(lines) + "\n\n"


def tsv_to_lattice(block: str) -> list[Edge]:
    edges = []
    for line in block.strip("\n").split("\n"):
        if not line:
            continue
        f = line.split("\t")
        edges.append(Edge(int(f[0]), int(f[1]), f[2], int(f[7]),
                          lemma=f[3], upos=f[4], xpos=f[5], feats=f[6]))
    return edges


def read_transcripts_any(path: str, fmt: str = "parquet"):
    """Transcript reader for alternate source formats, normalized to
    the TRANSCRIPTS schema (column pruning only possible for parquet)."""
    import ray.data as rd

    from .schema import TRANSCRIPTS

    if fmt == "parquet":
        return rd.read_parquet(path)
    if fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "json":
        ds = rd.read_json(path)
    else:
        raise ValueError(fmt)

    names = [f.name for f in TRANSCRIPTS]

    def norm(t: pa.Table) -> pa.Table:
        cols = {}
        for field in TRANSCRIPTS:
            if field.name in t.column_names:
                cols[field.name] = t[field.name].cast(field.type)
            else:
                cols[field.name] = pa.nulls(t.num_rows, field.type)
        return pa.table(cols).select(names)

    return ds.map_batches(norm, batch_format="pyarrow")


def write_transcripts_jsonl(ds, out_dir: str) -> None:
    """Export a transcripts Dataset as partitioned JSONL (one file per
    block — the interchange shape for non-parquet consumers); inverse
    of read_transcripts_any(fmt='json')."""
    ds.write_json(out_dir)


def write_nbest_text(sents: list[list[str]],
                     nbest: list[list[tuple[list[str], float]]]) -> str:
    """The reference's n-best decoded-results TEXT format
    (utils/data.py:355-392 write_nbest_decoded_results): per sentence a
    '# s1 s2 ...' header of path scores at 4 decimals, then one line
    per token — 'word lbl1 lbl2 ... lbln' across the n best paths —
    and a blank line between sentences. ``nbest[i]`` is the
    [(labels, score), ...] list a Scorer.label_nbest returns."""
    out = []
    for toks, paths in zip(sents, nbest):
        out.append("# " + " ".join(format(s, ".4f") for _, s in paths))
        for i, w in enumerate(toks):
            out.append(" ".join([w] + [labels[i] for labels, _ in paths]))
        out.append("")
    return "\n".join(out) + "\n"


def read_nbest_text(text: str) -> list[tuple[list[str],
                                             list[tuple[list[str], float]]]]:
    """Inverse of write_nbest_text -> [(tokens, [(labels, score), ...])]."""
    sents = []
    for block in text.split("\n\n"):
        lines = [ln for ln in block.split("\n") if ln]
        if not lines or not lines[0].startswith("# "):
            continue
        scores = [float(s) for s in lines[0][2:].split()]
        toks, cols = [], [[] for _ in scores]
        for line in lines[1:]:
            fields = line.split(" ")
            toks.append(fields[0])
            for k, lab in enumerate(fields[1:]):
                cols[k].append(lab)
        sents.append((toks, list(zip(cols, scores))))
    return sents
