"""Deterministic NER scorers — the engine's stand-ins for the reference's
three NCRF++ BiLSTM-CRF model variants (token-single / token-multi /
morph; loaded+decoded at api_main.py:53-80, ncrf_main.py:135-192).

The reference repo ships no usable weights (.MISSING_LARGE_BLOBS) and
depends on an external Go analyzer, so this engine defines a ``Scorer``
protocol with the same dataflow signature (token lists in, BIOSE labels
out) and ships seeded deterministic gazetteer scorers as the default
implementation. A torch-backed scorer can be dropped into the same
actor-pool slot (SURVEY.md section 7.4). P/R is measured against the
single-process oracle running the identical deterministic chain, which
validates the distributed dataflow at P/R=1.0.

Deliberate knowledge asymmetries (they produce the same *kinds* of
errors real models make, deterministically — exercising the
keep_all_if_no_valid fallback of lattice pruning and all three
soft-merge mismatch cases):

  SCORER_PREFIXES  what the token scorers can strip/count ({be,le,ve,xa})
  MA_PREFIXES      what the analyzer can split  ({be,le,ve,mi,she,ha})
  - "xa'Paris":  scorer predicts 2 morphemes, analyzer can't split ->
                 no valid path -> fallback -> soft-merge case 3.
  - "ha'Acme":   scorer predicts 1, analyzer MUST split (mandatory) ->
                 fallback -> soft-merge case 2.
  - "mi'Paris":  scorer sees one opaque token (entity missed at token
                 level), analyzer prunes to the whole-token path.
"""

from __future__ import annotations

from .ops.labels import normalize_word

SCORER_PREFIXES = frozenset({"be", "le", "ve", "xa"})

# --- entity world table ---------------------------------------------------
# canon_id -> (category, aliases). First alias = canonical surface.
# Ambiguous alias: "Stark" -> org:stark AND per:tony_stark (conversation-
# context linking resolves it; engine.link).
ENTITIES: dict[str, tuple[str, tuple[str, ...]]] = {
    "per:alice_cohen": ("PER", ("Alice Cohen", "Alice")),
    "per:bob_dylan": ("PER", ("Bob Dylan", "Dylan", "Bob")),
    "per:dana_levi": ("PER", ("Dana Levi", "Dana")),
    "per:noa": ("PER", ("Noa",)),
    "per:charlie": ("PER", ("Charlie",)),
    "per:tony_stark": ("PER", ("Tony Stark", "Tony", "Stark")),
    "org:acme": ("ORG", ("Acme Corp", "Acme Corporation", "Acme")),
    "org:globex": ("ORG", ("Globex",)),
    "org:initech": ("ORG", ("Initech",)),
    "org:stark_industries": ("ORG", ("Stark Industries", "Stark")),
    "gpe:tel_aviv": ("GPE", ("Tel Aviv", "TLV")),
    "gpe:paris": ("GPE", ("Paris",)),
    "gpe:berlin": ("GPE", ("Berlin",)),
    "gpe:new_york": ("GPE", ("New York", "NYC")),
    "gpe:haifa": ("GPE", ("Haifa",)),
    "loc:jordan_river": ("LOC", ("Jordan River",)),
    "loc:dead_sea": ("LOC", ("Dead Sea",)),
    "loc:mount_hermon": ("LOC", ("Mount Hermon",)),
    "eve:world_cup": ("EVE", ("World Cup",)),
    "eve:eurovision": ("EVE", ("Eurovision",)),
    "fac:azrieli_tower": ("FAC", ("Azrieli Tower", "Azrieli")),
    "fac:central_station": ("FAC", ("Central Station",)),
    "woa:hamlet": ("WOA", ("Hamlet",)),
    "woa:the_odyssey": ("WOA", ("The Odyssey", "Odyssey")),
}

# relation phrase -> predicate (scanned over the lowercased gap between
# two adjacent mentions; engine.triples)
RELATIONS: dict[tuple[str, ...], str] = {
    ("works", "at"): "works_at",
    ("worked", "at"): "works_at",
    ("met",): "met",
    ("visited",): "visited",
    ("acquired",): "acquired",
    ("located", "in"): "located_in",
    ("attended",): "attended",
    ("traveled", "to"): "traveled_to",
    ("joined",): "joined",
    ("moved", "to"): "moved_to",
}


def build_gazetteer() -> tuple[dict[tuple[str, ...], str], int]:
    """surface token-tuple -> category; plus max surface length in tokens.
    Deterministic conflict rule: lexicographically-smallest canon id wins
    a surface (only 'Stark' collides; linking handles the ambiguity)."""
    gaz: dict[tuple[str, ...], str] = {}
    owner: dict[tuple[str, ...], str] = {}
    for canon_id in sorted(ENTITIES):
        cat, aliases = ENTITIES[canon_id]
        for alias in aliases:
            key = tuple(alias.split(" "))
            if key not in gaz:
                gaz[key] = cat
                owner[key] = canon_id
    return gaz, max(len(k) for k in gaz)


def build_alias_index() -> dict[str, list[str]]:
    """lowercased alias surface -> sorted candidate canon ids (the
    broadcast small side of entity linking, SURVEY.md J11)."""
    idx: dict[str, list[str]] = {}
    for canon_id, (_cat, aliases) in ENTITIES.items():
        for alias in aliases:
            idx.setdefault(alias.lower(), []).append(canon_id)
    return {k: sorted(v) for k, v in idx.items()}


def token_core(token: str) -> str:
    """Strip the maximal leading run of scorer-known fused prefixes."""
    parts = token.split("'")
    d = 0
    while d < len(parts) - 1 and parts[d] in SCORER_PREFIXES:
        d += 1
    return "'".join(parts[d:])


def prefix_count(token: str) -> int:
    """How many morphemes the token-multi scorer predicts = stripped
    prefixes + 1 (the core counts as one morpheme even if opaque)."""
    parts = token.split("'")
    d = 0
    while d < len(parts) - 1 and parts[d] in SCORER_PREFIXES:
        d += 1
    return d + 1


class GazetteerScorer:
    """Shared greedy longest-match span finder over a token sequence.
    State (gazetteer dict) is built once — in Ray this object lives in
    an actor's __init__ (stage classes in engine.pipeline)."""

    def __init__(self) -> None:
        self.gaz, self.max_len = build_gazetteer()

    def find_spans(self, surfaces: list[str]) -> list[tuple[int, int, str]]:
        """[(start, end_exclusive, category)] — greedy longest match,
        left to right, case-sensitive, digit-normalized."""
        toks = [normalize_word(t) for t in surfaces]
        spans = []
        i, n = 0, len(toks)
        while i < n:
            hit = None
            for L in range(min(self.max_len, n - i), 0, -1):
                if tuple(toks[i : i + L]) in self.gaz:
                    hit = (i, i + L, self.gaz[tuple(toks[i : i + L])])
                    break
            if hit:
                spans.append(hit)
                i = hit[1]
            else:
                i += 1
        return spans

    @staticmethod
    def spans_to_biose(n: int, spans: list[tuple[int, int, str]]) -> list[str]:
        labels = ["O"] * n
        for s, e, cat in spans:
            if e - s == 1:
                labels[s] = "S-" + cat
            else:
                labels[s] = "B-" + cat
                for j in range(s + 1, e - 1):
                    labels[j] = "I-" + cat
                labels[e - 1] = "E-" + cat
        return labels


class TokenSingleScorer(GazetteerScorer):
    """token-single variant: one BIOSE tag per token, matching on token
    cores (fused prefixes stripped)."""

    def label(self, tokens: list[str]) -> list[str]:
        cores = [token_core(t) for t in tokens]
        return self.spans_to_biose(len(tokens), self.find_spans(cores))

    def label_nbest(self, tokens: list[str], n: int = 3
                    ) -> list[tuple[list[str], float]]:
        """n-best analog of the CRF n-best decode (model/crf.py:268-418,
        written with '# score' headers by utils/data.py:355-392):
        alternative labelings drop the rightmost span one at a time,
        scores decay deterministically."""
        cores = [token_core(t) for t in tokens]
        spans = self.find_spans(cores)
        out = []
        for k in range(min(n, len(spans) + 1)):
            keep = spans[: len(spans) - k]
            out.append(
                (self.spans_to_biose(len(tokens), keep), round(0.9 ** k, 6))
            )
        return out


class TokenMultiScorer(GazetteerScorer):
    """token-multi variant: one ^-joined multi-label per token, one atom
    per predicted morpheme (README.md:72-75 format); prefix atoms are O,
    the core atom carries the span tag."""

    @staticmethod
    def _to_multi(tokens: list[str], core_tags: list[str]) -> list[str]:
        out = []
        for tok, tag in zip(tokens, core_tags):
            k = prefix_count(tok) - 1
            out.append("^".join(["O"] * k + [tag]))
        return out

    def label(self, tokens: list[str]) -> list[str]:
        cores = [token_core(t) for t in tokens]
        core_tags = self.spans_to_biose(len(tokens), self.find_spans(cores))
        return self._to_multi(tokens, core_tags)

    def label_nbest(self, tokens: list[str], n: int = 3
                    ) -> list[tuple[list[str], float]]:
        """Generic n-best analog (model/crf.py:268-418 is variant-
        agnostic): same drop-rightmost-span ladder as token-single,
        re-encoded into ^-multi labels."""
        cores = [token_core(t) for t in tokens]
        spans = self.find_spans(cores)
        out = []
        for k in range(min(n, len(spans) + 1)):
            keep = spans[: len(spans) - k]
            tags = self.spans_to_biose(len(tokens), keep)
            out.append((self._to_multi(tokens, tags), round(0.9 ** k, 6)))
        return out


class MorphScorer(GazetteerScorer):
    """morph variant: one BIOSE tag per morpheme (post-MD forms)."""

    def label(self, forms: list[str]) -> list[str]:
        return self.spans_to_biose(len(forms), self.find_spans(list(forms)))

    def label_nbest(self, forms: list[str], n: int = 3
                    ) -> list[tuple[list[str], float]]:
        """n-best over morpheme forms, same deterministic ladder."""
        spans = self.find_spans(list(forms))
        out = []
        for k in range(min(n, len(spans) + 1)):
            keep = spans[: len(spans) - k]
            out.append(
                (self.spans_to_biose(len(forms), keep), round(0.9 ** k, 6))
            )
        return out
