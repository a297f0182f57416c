"""BIOSE label algebra — pure, bit-exact re-implementations of the
reference's label semantics (NOT copies; semantics studied from
/root/reference and re-derived).

Semantics sources (file:line into /root/reference):
  fix_multi_biose            ne_evaluate_mentions.py:5-24
  get_fixed_for_valid_biose  nemo.py:154-170
  get_fixed_for_invalid_biose nemo.py:173-185
  validate_biose_sequence    nemo.py:189-210
  get_fixed_bio_sequence     nemo.py:213-214
  tag-scheme converters      utils/tagSchemeConverter.py:16-125

All functions here are scalar/pure so they can be used identically from
the distributed Ray stages and from the single-process oracle — the
distributed-vs-oracle comparison then validates dataflow, not math.
"""

from __future__ import annotations

import re

MULTI_DELIM = "^"

# --- fix_multi_biose (ne_evaluate_mentions.py:5-24) ----------------------
# Collapse a ^-joined multi-label into ONE token-level BIOSE tag:
#   bio  = S if any atom starts with S; S if both B and E present;
#          else E; else B; else I; else O     (exact priority order)
#   cat  = first category in the string, truncated to 3 chars
def fix_multi_biose(tag: str, multi_delim: str = MULTI_DELIM) -> str:
    parts = [x[0] for x in tag.split(multi_delim)]
    cat = ""
    if "-" in tag:
        cat = "-" + tag.split("-")[1][:3]
    bio = "O"
    if "S" in parts:
        bio = "S"
    elif "B" in parts and "E" in parts:
        bio = "S"
    elif "E" in parts:
        bio = "E"
    elif "B" in parts:
        bio = "B"
    elif "I" in parts:
        bio = "I"
    return bio + cat


# --- intra-token BIOSE sequence validation/fix (nemo.py:154-214) ---------
_O_RE = re.compile(r"^O+$")
_S_RE = re.compile(r"^O*SO*$|^O*BI*EO*$")
_B_RE = re.compile(r"^O*BI*$")
_I_RE = re.compile(r"^I+$")
_E_RE = re.compile(r"^I*EO*$")
_VALID_BIO_RE = re.compile(r"^O*BI*$|^O*BI*EO*$|^I+$|^I*EO*$|^O*SO*$")


def get_fixed_for_valid_biose(bio_seq: str) -> str:
    """Map a *valid* intra-token bio char sequence to a single tag char.

    Order of the regex chain is load-bearing (nemo.py:160-169).
    """
    if _O_RE.match(bio_seq):
        return "O"
    if _S_RE.match(bio_seq):
        return "S"
    if _B_RE.match(bio_seq):
        return "B"
    if _I_RE.match(bio_seq):
        return "I"
    if _E_RE.match(bio_seq):
        return "E"
    raise ValueError(bio_seq)


def get_fixed_for_invalid_biose(parts) -> str:
    """Priority rule S > B&E > E > B > I for invalid sequences
    (nemo.py:173-185). ``parts`` is any container of single chars
    (a string works: membership test is per-char)."""
    bio = "O"
    if "S" in parts:
        bio = "S"
    elif "B" in parts and "E" in parts:
        bio = "S"
    elif "E" in parts:
        bio = "E"
    elif "B" in parts:
        bio = "B"
    elif "I" in parts:
        bio = "I"
    return bio


def validate_biose_sequence(full_bio_seq) -> tuple[bool, bool, str]:
    """Validate the BIOSE tags of the morphemes of ONE token and produce
    the fixed single token-level tag (nemo.py:189-210).

    full_bio_seq: sequence of per-morpheme tags like ("O", "B-GPE", "E-GPE").
    Returns (is_valid, single_category, fixed_tag). Category attached to
    the fixed tag is the FIRST category in sequence (full, untruncated).
    """
    pairs = [("O", None) if b == "O" else tuple(b.split("-")) for b in full_bio_seq]
    bio_seq = "".join(p[0] for p in pairs)
    type_seq = [p[1] for p in pairs if p[1] is not None]
    valid = _VALID_BIO_RE.match(bio_seq) is not None

    if valid:
        fixed = get_fixed_for_valid_biose(bio_seq)
    else:
        fixed = get_fixed_for_invalid_biose(bio_seq)
    if fixed != "O":
        fixed += "-" + type_seq[0]
    return valid, len(set(type_seq)) <= 1, fixed


def get_fixed_bio_sequence(full_bio_seq) -> str:
    return validate_biose_sequence(full_bio_seq)[2]


# --- biose_count (nemo.py:66-75, api_main.py:197-205) --------------------
def biose_count(tag: str, multi_delim: str = MULTI_DELIM) -> int:
    """Number of morpheme atoms a multi-tag predicts = len(split('^'))."""
    return len(tag.split(multi_delim))


# --- tag scheme converters (utils/tagSchemeConverter.py:16-125) ----------
# Re-expressed over label lists (the reference converts files; stages in
# this engine convert the labels:list<string> column of one sentence).
def bio_to_bioes(labels: list[str]) -> list[str]:
    labels = [l.upper() for l in labels]
    out = []
    n = len(labels)
    for idx, lab in enumerate(labels):
        if "-" not in lab:
            out.append(lab)
            continue
        label_type = lab.split("-")[-1]
        nxt_is_i = idx < n - 1 and "I-" in labels[idx + 1]
        if "B-" in lab:
            out.append(("B-" if nxt_is_i else "S-") + label_type)
        elif "I-" in lab:
            out.append(("I-" if nxt_is_i else "E-") + label_type)
        else:
            out.append(lab)
    return out


def bioes_to_bio(labels: list[str]) -> list[str]:
    out = []
    for lab in labels:
        lab = lab.upper()
        if "-" not in lab:
            out.append(lab)
        elif "E-" in lab:
            out.append("I-" + lab.split("-")[-1])
        elif "S-" in lab:
            out.append("B-" + lab.split("-")[-1])
        else:
            out.append(lab)
    return out


def iob_to_bio(labels: list[str]) -> list[str]:
    labels = [l.upper() for l in labels]
    out = []
    for idx, lab in enumerate(labels):
        if "I-" in lab:
            label_type = lab.split("-")[-1]
            prev = labels[idx - 1] if idx > 0 else "O"
            if idx == 0 or prev == "O" or label_type != prev.split("-")[-1]:
                out.append("B-" + label_type)
            else:
                out.append(lab)
        else:
            out.append(lab)
    return out


# --- digit normalization (utils/functions.py:11-18) ----------------------
_DIGIT_RE = re.compile(r"\d")


def normalize_word(word: str) -> str:
    """Every digit char -> '0' (utils/functions.py:11-18)."""
    return _DIGIT_RE.sub("0", word)
