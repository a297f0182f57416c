"""Unit tests for the BIOSE algebra — every branch of fix_multi_biose
(ne_evaluate_mentions.py:5-24), validate_biose_sequence (nemo.py:189-210)
and the tag-scheme converters (utils/tagSchemeConverter.py), with literal
cases shaped like the reference's example_output_* files (FIXTURES.md F2).
"""

from engine.ops.labels import (
    bio_to_bioes,
    bioes_to_bio,
    biose_count,
    fix_multi_biose,
    get_fixed_bio_sequence,
    get_fixed_for_invalid_biose,
    get_fixed_for_valid_biose,
    iob_to_bio,
    normalize_word,
    validate_biose_sequence,
)


def test_fix_multi_biose_priority_chain():
    assert fix_multi_biose("O") == "O"
    assert fix_multi_biose("O^S-PER") == "S-PER"
    assert fix_multi_biose("B-ORG^E-ORG") == "S-ORG"  # B&E -> S
    assert fix_multi_biose("O^E-GPE") == "E-GPE"
    assert fix_multi_biose("O^B-ORG^I-ORG") == "B-ORG"
    assert fix_multi_biose("I-LOC^I-LOC") == "I-LOC"
    # first category wins and is truncated to 3 chars
    assert fix_multi_biose("B-PERSON^E-ORGX") == "S-PER"
    assert fix_multi_biose("O-ORG^B-ORG^I-ORG") == "B-ORG"


def test_valid_biose_regex_chain():
    assert get_fixed_for_valid_biose("OO") == "O"
    assert get_fixed_for_valid_biose("OSO") == "S"
    assert get_fixed_for_valid_biose("BIE") == "S"
    assert get_fixed_for_valid_biose("OBI") == "B"
    assert get_fixed_for_valid_biose("II") == "I"
    assert get_fixed_for_valid_biose("IEO") == "E"


def test_invalid_biose_priority():
    assert get_fixed_for_invalid_biose("EB") == "S"  # B&E present
    assert get_fixed_for_invalid_biose("EE") == "E"
    assert get_fixed_for_invalid_biose("BB") == "B"
    assert get_fixed_for_invalid_biose("IOI") == "I"
    assert get_fixed_for_invalid_biose("SS") == "S"


def test_validate_biose_sequence():
    valid, single, fixed = validate_biose_sequence(("O", "B-GPE", "E-GPE"))
    assert valid and single and fixed == "S-GPE"  # OBE matches ^O*BI*EO*$
    valid, single, fixed = validate_biose_sequence(("O", "B-GPE"))
    assert valid and fixed == "B-GPE"
    valid, single, fixed = validate_biose_sequence(("E-PER", "B-ORG"))
    assert not valid and fixed == "S-PER"  # invalid, first category
    assert not single
    assert validate_biose_sequence(("O", "O"))[2] == "O"
    assert get_fixed_bio_sequence(("I-LOC", "E-LOC")) == "E-LOC"


def test_biose_count():
    assert biose_count("O") == 1
    assert biose_count("O^B-ORG^I-ORG") == 3


def test_tag_scheme_converters():
    bio = ["B-PER", "I-PER", "O", "B-ORG", "O"]
    assert bio_to_bioes(bio) == ["B-PER", "E-PER", "O", "S-ORG", "O"]
    assert bioes_to_bio(["B-PER", "E-PER", "O", "S-ORG"]) == [
        "B-PER", "I-PER", "O", "B-ORG",
    ]
    assert iob_to_bio(["I-PER", "I-PER", "O", "I-ORG"]) == [
        "B-PER", "I-PER", "O", "B-ORG",
    ]
    # round trip
    assert bioes_to_bio(bio_to_bioes(bio)) == bio


def test_normalize_word():
    assert normalize_word("abc123x4") == "abc000x0"
    assert normalize_word("2019") == "0000"
