"""Property-based tests (hypothesis) for the pure label algebra and
span machinery — the reference's behaviors hold over the full input
space, not just hand-picked fixtures. No Ray needed (pure functions)."""

from hypothesis import given, settings, strategies as st

CATS = ["PER", "ORG", "GPE", "LOC"]


def _bio_seqs():
    """Random VALID BIO sequences (the bio_to_bioes input contract)."""

    @st.composite
    def seqs(draw):
        n = draw(st.integers(1, 12))
        out = []
        prev_cat = None
        for _ in range(n):
            choice = draw(st.integers(0, 2))
            if choice == 0:
                out.append("O")
                prev_cat = None
            elif choice == 1 or prev_cat is None:
                cat = draw(st.sampled_from(CATS))
                out.append(f"B-{cat}")
                prev_cat = cat
            else:
                out.append(f"I-{prev_cat}")
        return out

    return seqs()


@given(_bio_seqs())
@settings(max_examples=200, deadline=None)
def test_bio_bioes_roundtrip(seq):
    from engine.ops.labels import bio_to_bioes, bioes_to_bio

    assert bioes_to_bio(bio_to_bioes(seq)) == seq


@given(_bio_seqs())
@settings(max_examples=200, deadline=None)
def test_bioes_output_is_valid_bioes(seq):
    from engine.ops.labels import bio_to_bioes

    out = bio_to_bioes(seq)
    assert len(out) == len(seq)
    for i, tag in enumerate(out):
        if tag == "O":
            continue
        p, cat = tag.split("-", 1)
        assert p in {"B", "I", "E", "S"}
        if p in ("B", "I"):  # must continue with I/E of same cat
            nxt = out[i + 1]
            np_, ncat = nxt.split("-", 1)
            assert np_ in {"I", "E"} and ncat == cat
        if p in ("I", "E"):  # must follow B/I of same cat
            prv = out[i - 1]
            pp, pcat = prv.split("-", 1)
            assert pp in {"B", "I"} and pcat == cat


@st.composite
def _morph_tags(draw):
    n = draw(st.integers(1, 6))
    tags = []
    for _ in range(n):
        if draw(st.booleans()):
            tags.append("O")
        else:
            p = draw(st.sampled_from(["B", "I", "E", "S"]))
            tags.append(f"{p}-{draw(st.sampled_from(CATS))}")
    return tags


@given(_morph_tags())
@settings(max_examples=300, deadline=None)
def test_fixed_bio_sequence_total_and_shaped(tags):
    """get_fixed_bio_sequence is total over arbitrary morpheme tag
    lists and always returns a single well-shaped token tag."""
    from engine.ops.labels import get_fixed_bio_sequence

    out = get_fixed_bio_sequence(tags)
    assert isinstance(out, str) and out
    if out != "O":
        p, cat = out.split("-", 1)
        assert p in {"B", "I", "E", "S"}
        assert cat in CATS


@given(_morph_tags(), st.integers(0, 3))
@settings(max_examples=200, deadline=None)
def test_fix_multi_biose_idempotent(tags, seed):
    """fix_multi_biose on an already-single tag is identity-shaped:
    applying it twice equals applying it once."""
    from engine.ops.labels import MULTI_DELIM, fix_multi_biose

    multi = MULTI_DELIM.join(tags)
    once = fix_multi_biose(multi)
    assert fix_multi_biose(once) == once


@given(st.lists(st.sampled_from(
    ["O"] + [f"{p}-{c}" for p in "BIES" for c in CATS]), min_size=0,
    max_size=15))
@settings(max_examples=200, deadline=None)
def test_parse_spans_within_bounds_and_labeled(tags):
    """Span extraction is total over arbitrary (even invalid) BIOSE
    streams; every span is in-bounds with a known category and its
    surface equals the joined covered tokens."""
    from engine.ops.spans import parse_spans

    tokens = [f"t{i}" for i in range(len(tags))]
    spans = parse_spans(tokens, tags)
    for surface, label, start, end in spans:
        assert 0 <= start < end <= len(tags)
        assert label in CATS
        assert surface == " ".join(tokens[start:end])
