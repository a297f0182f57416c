"""Doc-shaped JSON emitter (engine/docjson.py) — the reference's API
response format as a batch surface, with the verbosity ladder."""

import json


def _sp():
    from engine.kgflow import SentenceProcessor

    return SentenceProcessor()


def test_doc_basic_shape():
    from engine.docjson import to_doc

    sp = _sp()
    d = to_doc("Alice Cohen visited be'Tel Aviv", sp, verbosity=0)
    assert d["text"].startswith("Alice")
    assert [t["text"] for t in d["tokens"]] == [
        "Alice", "Cohen", "visited", "be'Tel", "Aviv"]
    # every token carries its morphs; the fused token split into two
    fused = d["tokens"][3]
    assert [m["form"] for m in fused["morphs"]] == ["be", "Tel"]
    # verbosity 0: no intermediate predictions, no syntax
    assert "nemo_multi" not in d["tokens"][0]
    assert "lemma" not in fused["morphs"][0]
    assert "dep_tree" not in d
    # ents dict carries mention lists per scenario
    assert any(e["label"] == "PER" for e in d["ents"]["token_single"])
    json.dumps(d)  # serializable


def test_doc_verbosity_ladder_and_lattices():
    from engine.docjson import to_doc

    sp = _sp()
    text = "Dana Levi met be'Acme"
    d1 = to_doc(text, sp, verbosity=1)
    assert "nemo_multi" in d1["tokens"][0]
    d2 = to_doc(text, sp, verbosity=2, include_lattices=True)
    morphs = [m for t in d2["tokens"] for m in t["morphs"]]
    assert all({"id", "head", "deprel", "lemma", "pos"} <= set(m) for m in morphs)
    roots = [m for m in morphs if m["deprel"] == "root"]
    assert len(roots) == 1 and roots[0]["head"] == 0
    assert d2["dep_tree"].count("\n") == len(morphs) - 1
    for k in ("ma_lattice", "pruned_lattice", "md_lattice"):
        assert k in d2 and d2[k].strip()


def test_scorer_nbest_multi_and_morph():
    """S7: n-best for the multi and morph variants — head equals the
    1-best, scores decay, atom counts preserved per token."""
    from engine.scorers import MorphScorer, TokenMultiScorer

    toks = ["Alice", "met", "be'Tel", "Aviv"]
    tm = TokenMultiScorer()
    nb = tm.label_nbest(toks, n=3)
    assert nb[0][0] == tm.label(toks)
    assert [s for _, s in nb] == sorted((s for _, s in nb), reverse=True)
    for labels, _ in nb:
        assert [l.count("^") for l in labels] == [l.count("^") for l in nb[0][0]]

    ms = MorphScorer()
    forms = ["Alice", "met", "be", "Tel", "Aviv"]
    nbm = ms.label_nbest(forms, n=4)
    assert nbm[0][0] == ms.label(forms)
    assert len(nbm) >= 2 and nbm[1][1] < nbm[0][1]
