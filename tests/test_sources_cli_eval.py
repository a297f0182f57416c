"""Interchange sources, distributed eval, and CC unit coverage."""

import pyarrow as pa


def test_labeled_conll_roundtrip():
    from engine.sources import read_labeled_conll, write_labeled_conll

    text = "# score 0.9\nAlice S-PER\nworks O\n\nat O\nAcme B-ORG\nCorp E-ORG\n\n"
    sents = read_labeled_conll(text)
    assert sents[0][1] == [("Alice", "S-PER"), ("works", "O")]
    assert sents[1][1][1] == ("Acme", "B-ORG")
    # multi-tag fix applied on read
    fixed = read_labeled_conll("x O^B-ORG^I-ORG\n\n")
    assert fixed[0][1] == [("x", "B-ORG")]
    out = write_labeled_conll([s for _i, s in sents])
    assert "Alice S-PER" in out and out.endswith("\n")
    assert write_labeled_conll([["tok"]], dummy_o=True).startswith("tok O")


def test_lattice_tsv_roundtrip():
    from engine.ops.lattice import build_sentence_lattice
    from engine.sources import lattice_to_tsv, tsv_to_lattice

    lat = build_sentence_lattice(["be'Tel", "Aviv"])
    tsv = lattice_to_tsv(lat)
    back = tsv_to_lattice(tsv)
    assert [(e.id1, e.id2, e.form, e.token_id) for e in back] == [
        (e.id1, e.id2, e.form, e.token_id) for e in lat
    ]


def test_local_components_unionfind():
    from engine.canon import local_components

    roots = local_components([("b", "a"), ("c", "b"), ("y", "x")])
    assert roots["a"] == roots["b"] == roots["c"] == "a"
    assert roots["x"] == roots["y"] == "x"


def test_distributed_components_matches_local(ray_session):
    import ray.data as rd

    from engine.canon import components, local_components

    edges = [("n%d" % i, "n%d" % (i + 1)) for i in range(0, 20, 2)]
    edges += [("n2", "n3"), ("n10", "n11"), ("a", "b")]
    local = local_components(edges)
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    dist = {r["node"]: r["root"] for r in components(ds).take_all()}
    assert dist == local


def test_distributed_eval_matches_local(ray_session):
    import ray.data as rd

    from engine.eval import evaluate_datasets, evaluate_tables

    gold = pa.table({"k1": [1, 1, 2, 3], "k2": ["a", "a", "b", "c"],
                     "occ": [1, 2, 1, 1]})
    pred = pa.table({"k1": [1, 2, 4], "k2": ["a", "b", "d"], "occ": [1, 1, 1]})
    keys = ["k1", "k2", "occ"]
    want = evaluate_tables(gold, pred, keys)
    got = evaluate_datasets(rd.from_arrow(gold), rd.from_arrow(pred), keys)
    assert got == want


def test_cli_synth_run_eval(ray_session, tmp_path):
    from engine.cli import main

    tdir = str(tmp_path / "t")
    assert main(["synth", "--out", tdir, "--convs", "5"]) == 0
    out = str(tmp_path / "kg")
    assert main(["run", "--input", tdir, "--out", out, "--buckets", "4"]) == 0
    import os

    assert os.path.isdir(os.path.join(out, "triples"))
    assert main(["eval", "--gold", os.path.join(out, "triples"),
                 "--pred", os.path.join(out, "triples")]) == 0


def test_cli_docjson(ray_session, tmp_path):
    """docjson subcommand = the reference API surface as a batch job:
    Doc-shaped JSON per turn, verbosity fields, md-variant plumbed."""
    import json as _json
    import os

    import duckdb

    from engine.cli import main

    tdir = str(tmp_path / "t")
    assert main(["synth", "--out", tdir, "--convs", "4"]) == 0
    dj = str(tmp_path / "dj")
    assert main(["docjson", "--input", tdir, "--out", dj,
                 "--verbosity", "2", "--md-variant", "md"]) == 0
    df = duckdb.sql(
        f"SELECT * FROM '{os.path.join(dj, '*.parquet')}'").df()
    assert set(df.columns) == {"conv_id", "turn_idx", "doc_json"}
    assert len(df) > 0
    doc = _json.loads(df["doc_json"].iloc[0])
    # verbosity-2 Doc shape: ents + tokens + dep info present
    assert {"text", "ents", "tokens", "dep_tree"} <= set(doc)


def test_distributed_components_long_chain(ray_session):
    """Path graphs are the adversarial shape for min-label propagation
    (MinHash candidate generation emits id CHAINS): a 500-hop path
    exceeds any per-hop round budget, so this proves the pointer-jump
    path converges in O(log diameter) BSP rounds with correct roots."""
    import ray.data as rd

    from engine.canon import components, local_components

    edges = [("n%05d" % i, "n%05d" % (i + 1)) for i in range(500)]
    edges += [("s%03d" % (i // 4), "t%04d" % i) for i in range(400)]
    local = local_components(edges)
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    dist = {r["node"]: r["root"] for r in components(ds, num_partitions=8).take_all()}
    assert dist == local


def test_transcripts_jsonl_csv_roundtrip(ray_session, tmp_path):
    """read_transcripts_any normalizes JSONL and CSV exports back to
    the TRANSCRIPTS schema with identical rows."""
    import ray.data as rd

    from engine.sources import read_transcripts_any, write_transcripts_jsonl
    from engine.synth import make_transcripts_local

    t = make_transcripts_local(n_convs=5, seed=9)
    ds = rd.from_arrow(t)
    jdir = str(tmp_path / "j")
    write_transcripts_jsonl(ds, jdir)
    back = read_transcripts_any(jdir, fmt="json").to_pandas()
    orig = t.to_pandas()
    key = ["conv_id", "turn_idx"]
    back = back.sort_values(key).reset_index(drop=True)
    orig = orig.sort_values(key).reset_index(drop=True)
    assert list(back.columns) == list(orig.columns)
    assert (back["text"] == orig["text"]).all()
    assert len(back) == len(orig)


def test_nbest_text_roundtrip():
    """utils/data.py:355-392 n-best text format: '# score...' header,
    'word lbl1..lbln' rows, blank line between sentences."""
    from engine.sources import read_nbest_text, write_nbest_text

    sents = [["Alice", "met"], ["Bob"]]
    nbest = [
        [(["S-PER", "O"], 1.25), (["O", "O"], 0.5)],
        [(["S-PER"], 2.0)],
    ]
    text = write_nbest_text(sents, nbest)
    lines = text.split("\n")
    assert lines[0] == "# 1.2500 0.5000"
    assert lines[1] == "Alice S-PER O"
    assert lines[2] == "met O O"
    assert lines[3] == ""
    assert lines[4] == "# 2.0000"
    back = read_nbest_text(text)
    assert [t for t, _ in back] == sents
    assert [[(l, s) for l, s in nb] for _, nb in back] == nbest


def test_nbest_text_from_scorer():
    from engine.ncrf import NcrfScorer
    from engine.sources import read_nbest_text, write_nbest_text
    from engine.vocab import Alphabet

    a = Alphabet("word")
    for w in ["Alice", "met", "Bob"]:
        a.add(w)
    sc = NcrfScorer(word_alphabet=a, embedd_dim=8, seed=11)
    toks = ["Alice", "met", "Bob"]
    nb = sc.label_nbest(toks, n=3)
    text = write_nbest_text([toks], [nb])
    (toks2, nb2), = read_nbest_text(text)
    assert toks2 == toks
    assert [l for l, _ in nb2] == [l for l, _ in nb]
