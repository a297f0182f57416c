"""Deterministic surface tokenizer (analog of the reference's external
``bclm.tokenize`` used at nemo.py:20,29).

The reference tokenizes Hebrew text where prepositional/article prefixes
are fused onto the following word; our synthetic corpus (engine.synth)
marks fused prefixes with an apostrophe (``be'Paris`` = morphemes
``be`` + ``Paris``). The tokenizer keeps apostrophe-fused units as ONE
token (segmentation is the morphological analyzer's job — see
engine.ops.lattice), splits punctuation into its own tokens, and keeps
digit runs intact (digit normalization happens inside the scorers, per
utils/functions.py:11-18).
"""

from __future__ import annotations

import re

# word chars possibly joined by apostrophes, else any single non-space symbol
_TOKEN_RE = re.compile(r"\w+(?:'\w+)*|[^\w\s]", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """One turn/sentence -> list of surface tokens."""
    return _TOKEN_RE.findall(text)


def tokenize_lines(text: str) -> list[list[str]]:
    """Multi-line text -> one token list per non-blank line
    (semantics of nemo.py:25-31)."""
    return [tokenize(line.rstrip()) for line in text.split("\n") if line.strip()]
