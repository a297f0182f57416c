"""Lattice build/prune/MD (nemo.py:78-114 semantics) and the three
soft-merge mismatch cases (nemo.py:124-135), via the deliberate
scorer/analyzer knowledge asymmetries (engine.scorers docstring)."""

from engine.kgflow import SentenceProcessor
from engine.ops.align import morph_to_token_align, soft_merge_bio_labels
from engine.ops.lattice import (
    build_sentence_lattice,
    candidate_segmentations,
    md_select,
    prune_lattice,
)


def test_candidate_segmentations():
    assert candidate_segmentations("Paris") == [["Paris"]]
    assert candidate_segmentations("be'Paris") == [["be'Paris"], ["be", "Paris"]]
    # mandatory split: no whole-token candidate
    assert candidate_segmentations("ha'Acme") == [["ha", "Acme"]]
    # unknown prefix: only the whole token
    assert candidate_segmentations("xa'Paris") == [["xa'Paris"]]
    # two known prefixes: three candidates
    assert candidate_segmentations("ve'be'Paris") == [
        ["ve'be'Paris"], ["ve", "be'Paris"], ["ve", "be", "Paris"],
    ]


def test_prune_selects_count_matching_path():
    tokens = ["be'Paris"]
    lat = build_sentence_lattice(tokens)
    assert len(lat) == 3  # whole + 2-edge split
    # multi predicts 2 morphemes -> split path survives
    pruned = prune_lattice(lat, ["O^S-GPE"])
    assert [(e.form) for e in pruned] == ["be", "Paris"]
    assert md_select(pruned) == [("be", 1), ("Paris", 1)]
    # multi predicts 1 morpheme -> whole-token path survives
    pruned1 = prune_lattice(lat, ["S-GPE"])
    assert [e.form for e in pruned1] == ["be'Paris"]


def test_prune_fallback_keeps_all():
    # scorer predicts 2 morphemes but the analyzer cannot split -> no
    # valid path -> keep_all_if_no_valid fallback (nemo.py:91-92)
    tokens = ["xa'Paris"]
    lat = build_sentence_lattice(tokens)
    pruned = prune_lattice(lat, ["O^S-GPE"])
    assert [e.form for e in pruned] == ["xa'Paris"]


def test_md_prefers_most_split_then_lex():
    lat = build_sentence_lattice(["ve'be'Paris"])
    assert md_select(lat) == [("ve", 1), ("be", 1), ("Paris", 1)]


def test_soft_merge_three_cases():
    # case 1: equal lengths
    assert soft_merge_bio_labels(["O^S-GPE"], [("be", 1), ("Paris", 1)]) == [
        ("be", "O"), ("Paris", "S-GPE"),
    ]
    # case 2: more morphs than atoms -> pad head with O
    assert soft_merge_bio_labels(["S-ORG"], [("ha", 1), ("Acme", 1)]) == [
        ("ha", "O"), ("Acme", "S-ORG"),
    ]
    # case 3: more atoms than morphs -> keep the atom tail
    assert soft_merge_bio_labels(["O^S-GPE"], [("xa'Paris", 1)]) == [
        ("xa'Paris", "S-GPE"),
    ]


def test_morph_to_token_align():
    morphs = [("be", 1), ("Tel", 1), ("Aviv", 2)]
    labels = ["O", "B-GPE", "E-GPE"]
    assert morph_to_token_align(labels, morphs, 2) == ["B-GPE", "E-GPE"]


def test_full_sentence_asymmetries():
    sp = SentenceProcessor()
    rec = sp.process("ha'Acme acquired Globex .")
    # multi scorer misses ha'Acme (count 1), analyzer must split ->
    # fallback -> morph scorer recovers S-ORG on the Acme morpheme
    assert rec["labels_multi"][0] == "O"
    assert rec["morph_forms"][:2] == ["ha", "Acme"]
    assert rec["labels_morph"][1] == "S-ORG"
    assert rec["labels_tok_from_morph"][0] == "S-ORG"
    assert rec["labels_multi_align"][:2] == ["O", "O"]  # case-2 merge


def test_morph_attrs_populated_and_tsv_roundtrip():
    """Item 8: the LATTICE_EDGE schema's lemma/upos/xpos/feats are
    analyzer-filled, and the 8-col TSV round-trip preserves them."""
    from engine.ops.lattice import build_sentence_lattice
    from engine.sources import lattice_to_tsv, tsv_to_lattice

    lat = build_sentence_lattice(["be'Paris", "ha'Acme", "today"])
    by_form = {e.form: e for e in lat}
    # prefix morpheme
    assert by_form["be"].upos == "ADP" and by_form["be"].feats == "Prefix=Yes"
    assert by_form["be"].lemma == "be"
    # core after a mandatory-split (definite) prefix
    assert by_form["Acme"].feats == "Definite=Def"
    assert by_form["Acme"].upos == "PROPN" and by_form["Acme"].lemma == "acme"
    # plain lowercase token core
    assert by_form["today"].upos == "NOUN" and by_form["today"].feats == "_"
    # lemma is never faked to equal form for fused whole-token edges
    assert by_form["be'Paris"].lemma == "beparis"

    back = tsv_to_lattice(lattice_to_tsv(lat))
    assert back == lat


def test_dep_info_rule():
    """Item 7 (J9): (id, head, deprel) zip onto MD morphemes —
    prefixes attach to their token's core as 'case', cores chain,
    first core is root (api_main.py:338-351 zip semantics)."""
    from engine.ops.lattice import dep_info

    morphs = [("be", 1), ("Paris", 1), ("met", 2), ("ha", 3), ("Acme", 3)]
    got = dep_info(morphs)
    assert got == [
        (1, 2, "case"),   # be -> Paris
        (2, 0, "root"),   # Paris is first core
        (3, 2, "dep"),    # met -> Paris
        (4, 5, "case"),   # ha -> Acme
        (5, 3, "dep"),    # Acme -> met
    ]
    assert dep_info([]) == []


def test_process_with_dep_keeps_mentions_identical():
    from engine.kgflow import SentenceProcessor, kg_mentions

    sp = SentenceProcessor()
    text = "Alice Cohen works at be'Acme in Tel Aviv"
    r0 = sp.process(text)
    r1 = sp.process(text, with_dep=True)
    assert kg_mentions(r0) == kg_mentions(r1)
    assert len(r1["dep_info"]) == len(r1["morph_forms"])
    assert r0["dep_info"] == []


def test_md_variant_distinction():
    """api_main.py:133-137 divergence: API route = standalone 'md'
    (fewest-split), CLI route = 'joint' (most-split). Both must pick a
    real path through the same pruned lattice, deterministically."""
    import pytest

    from engine.ops.lattice import build_sentence_lattice, md_select

    # a token the rule-table analyzer can split (Hebrew-like prefix) —
    # find one from the analyzer's own candidate set
    from engine.ops.lattice import candidate_segmentations

    from engine.ops.lattice import MA_PREFIXES

    pref = sorted(MA_PREFIXES)[0]
    tok = f"{pref}'bit"
    assert len(candidate_segmentations(tok)) > 1
    assert tok is not None, "analyzer rule table lost its prefix rules?"
    lat = build_sentence_lattice([tok])
    joint = md_select(lat, "joint")
    md = md_select(lat, "md")
    assert len(joint) > len(md)  # most-split vs fewest-split
    assert md_select(lat) == joint  # default stays the CLI route
    # both are real paths: concatenated forms rebuild the token
    assert "".join(f for f, _ in md) == tok
    with pytest.raises(ValueError):
        md_select(lat, "yap")


def test_md_variant_threads_end_to_end():
    """The md/joint route choice must flow from SentenceProcessor /
    DocJsonStage (api_main.py md route analog) down to the decode —
    not just exist at the ops layer. The two routes can only disagree
    when the pruned lattice retains paths of different lengths (the
    NER-count keep-all fallback), so that scenario is exercised
    explicitly alongside the plumbing."""
    from engine.docjson import DocJsonStage
    from engine.kgflow import SentenceProcessor
    from engine.ops.lattice import (MA_PREFIXES, build_sentence_lattice,
                                    candidate_segmentations, md_select,
                                    prune_lattice)

    pref = sorted(MA_PREFIXES)[0]
    tok = f"{pref}'bit"
    assert len(candidate_segmentations(tok)) > 1

    # plumbing: the variant reaches the scorer state in both surfaces
    assert SentenceProcessor(md_variant="md").md_variant == "md"
    assert DocJsonStage(verbosity=0, md_variant="md").sp.md_variant == "md"
    # identical outputs when the pruned lattice is single-length (the
    # scorer's count picks one path length — both routes must agree)
    text = f"alpha {tok} omega"
    assert (SentenceProcessor().process(text)["morph_forms"]
            == SentenceProcessor(md_variant="md").process(text)["morph_forms"])

    # divergence under the keep-all fallback: a count the analyzer has
    # no path for keeps ALL paths, and the routes pick opposite ends
    lat = build_sentence_lattice([tok])
    pruned = prune_lattice(lat, ["O^O^O^O^O"])  # no 5-morph candidate
    joint = md_select(pruned, "joint")
    md = md_select(pruned, "md")
    assert len(joint) > len(md)
    assert "".join(f for f, _ in md) == tok
