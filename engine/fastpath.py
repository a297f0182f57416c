"""Vectorized batch implementation of the flagship per-turn KG chain.

Produces, for every transcript turn, EXACTLY the (mentions, relations)
that ``kgflow.SentenceProcessor`` + ``kg_mentions`` +
``relation_candidates`` produce (tests/test_fastpath.py asserts literal
equality against that reference path, which the single-process oracle
also runs) — but batch-vectorized instead of per-turn Python:

  - ONE regex pass tokenizes the whole batch (texts joined with a
    sentinel token that the tokenizer isolates; tokens never span the
    boundary because no token pattern can match across a non-word,
    non-space, non-apostrophe char).
  - every per-token quantity (scorer core, digit-normalized forms,
    gazetteer hits, MD segmentation, relation-phrase flags) is a pure
    function of the token STRING alone, so it is computed once per
    distinct token in a persistent registry and fetched by int code.
    The key enabler: ``md_select(prune_lattice(lattice, multi_labels))``
    decomposes per token (lattice node ranges never cross tokens,
    nemo.py:78-114 semantics), and the pruning count equals
    ``prefix_count(token)``, so the chosen segmentation depends only on
    the token itself.
  - the greedy longest-match span scan (GazetteerScorer.find_spans
    semantics) visits only positions whose token is a gazetteer hit or
    a multi-word-alias first word; everything else is numpy.
  - ``soft_merge_bio_labels`` on atoms of the shape O^...^O^TAG reduces
    to "each token's LAST morpheme carries the token's core tag" in all
    three length-mismatch cases (nemo.py:117-137); combined with the
    parse_spans O-abort rule, a multi-token core span survives on the
    morph axis iff every non-first member token has exactly one
    morpheme, so multi_align mentions are derived without building
    label sequences at all (the equality test covers this reduction).

Turns without an apostrophe-fused token take a fast path where
morph_hybrid == multi_align == one span match over the tokens (the
analyzer returns every token unchanged and every multi-tag has one
atom), proven by the same equality test.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pyarrow as pa

from .ops.labels import normalize_word
from .ops.lattice import candidate_segmentations
from .ops.tokenize import _TOKEN_RE
from .scorers import RELATIONS, build_gazetteer, prefix_count, token_core

MAX_REL_GAP = 4  # matches kgflow.MAX_REL_GAP
_SEP = "\x00"  # non-word, non-space -> always its own token (NB: \x1c-\x1f
# would NOT work: python re counts them as \s, so they never tokenize)

_BOOL_COLS = frozenset((2, 5, 7))  # bif_core, bif_form, relf


def _fnv64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def token_yap_morphs(token: str) -> tuple[str, ...]:
    """MD segmentation of one token over the UNPRUNED lattice (the
    morph_yap scenario route: md_select(lattice) with no NER-count
    pruning, nemo.py:276-305). Same most-split / lex-smallest policy,
    candidates never filtered. Pure per-token."""
    if "'" not in token:
        return (token,)
    cands = candidate_segmentations(token)
    cands.sort()
    return tuple(max(cands, key=len))


def token_md_morphs(token: str) -> tuple[str, ...]:
    """MD segmentation of one token under the hybrid track: candidates
    from the analyzer, pruned to paths whose length equals the
    token-multi scorer's predicted morpheme count (prefix_count), with
    the keep-all fallback, then md_select's most-split / lex-smallest
    policy. Pure per-token (see module docstring)."""
    if "'" not in token:
        return (token,)
    cands = candidate_segmentations(token)
    cnt = prefix_count(token)
    keep = [c for c in cands if len(c) == cnt] or cands
    keep.sort()  # lex order of form sequences (md_select path sort)
    return tuple(max(keep, key=len))  # first among longest


class _Registry:
    """str -> int code with parallel per-code attribute lists (mirrored
    as numpy arrays for vectorized take). One entry serves both views of
    a string: as a surface TOKEN (core-stripped scorer view, columns
    *_core) and as an MD FORM (matched as-is by the morph scorer,
    columns *_form)."""

    def __init__(self) -> None:
        gaz, self.max_len = build_gazetteer()
        self.gaz1 = {k[0]: v for k, v in gaz.items() if len(k) == 1}
        self.gazN: dict[int, dict[tuple, str]] = {
            L: {} for L in range(2, self.max_len + 1)}
        first = set()
        for k, v in gaz.items():
            if len(k) >= 2:
                self.gazN[len(k)][k] = v
                first.add(k[0])
        self._first = first

        self.rel_max = max(len(p) for p in RELATIONS)
        self.rel1 = {p[0]: v for p, v in RELATIONS.items() if len(p) == 1}
        self.relN: dict[int, dict[tuple, str]] = {
            L: {} for L in range(2, self.rel_max + 1)}
        rfirst = set()
        for p, v in RELATIONS.items():
            if len(p) >= 2:
                self.relN[len(p)][p] = v
                rfirst.add(p[0])
        self._rfirst = rfirst

        self._codes: dict[str, int] = {}
        # per-code columns: norm_core, cat_core, bif_core, norm_form,
        # cat_form, bif_form, lower, relf, rel1, morphs (pruned-MD),
        # yap_morphs (unpruned MD)
        self._cols: list[list] = [[] for _ in range(11)]
        self._arrays: list[np.ndarray] | None = None
        # two-word gazetteer probe memo per view, keyed by the packed
        # (code, code) pair int — codes are stable until the 2M-vocab
        # backstop reinit, which rebuilds these with everything else
        self.pair_core: dict[int, str | None] = {}
        self.pair_form: dict[int, str | None] = {}
        self._mcnt: np.ndarray | None = None

    def _register(self, s: str) -> int:
        core = token_core(s)
        nc = normalize_word(core)
        nf = nc if core == s else normalize_word(s)
        lo = s.lower()
        code = len(self._codes)
        self._codes[s] = code
        cols = self._cols
        cols[0].append(nc)
        cols[1].append(self.gaz1.get(nc))
        cols[2].append(nc in self._first)
        cols[3].append(nf)
        cols[4].append(self.gaz1.get(nf))
        cols[5].append(nf in self._first)
        cols[6].append(lo)
        cols[7].append(lo in self._rfirst)
        cols[8].append(self.rel1.get(lo))
        cols[9].append(token_md_morphs(s))
        cols[10].append(token_yap_morphs(s))
        self._arrays = None
        return code

    def encode(self, strs: list[str]) -> np.ndarray:
        if len(self._codes) > 2_000_000:  # unbounded-vocab backstop
            self.__init__()
        get = self._codes.get
        reg = self._register
        codes = [c if (c := get(s)) is not None else reg(s) for s in strs]
        return np.asarray(codes, dtype=np.int64)

    def arrays(self) -> list[np.ndarray]:
        """numpy mirrors of the per-code columns (rebuilt only after new
        registrations; vocabulary stabilizes after the first batches)."""
        if self._arrays is None:
            self._arrays = [
                np.array(c, dtype=(bool if i in _BOOL_COLS else object))
                for i, c in enumerate(self._cols)
            ]
        return self._arrays

    def morph_counts(self) -> np.ndarray:
        """per-code pruned-MD morpheme count (len of column 9), for the
        vectorized slow-row form-stream build."""
        if self._mcnt is None or len(self._mcnt) != len(self._cols[9]):
            self._mcnt = np.fromiter(
                (len(m) for m in self._cols[9]), np.int64, len(self._cols[9]))
        return self._mcnt


def _greedy_spans(norm: np.ndarray, cat1: np.ndarray, bif: np.ndarray,
                  row_of: list[int], row_start: list[int],
                  row_end: list[int], gazN, max_len: int):
    """find_spans semantics over a flat multi-row stream: greedy longest
    match, left to right; spans never cross rows. Returns
    {row: [(local_start, local_end, category)]}."""
    out: dict[int, list[tuple[int, int, str]]] = {}
    nf = -1  # absolute next-free position (rows are contiguous)
    hits = np.flatnonzero(bif | (cat1 != None))  # noqa: E711
    for pos in hits.tolist():
        if pos < nf:
            continue
        cat = None
        L = 1
        if bif[pos]:
            re_ = row_end[row_of[pos]]
            for L2 in range(min(max_len, re_ - pos), 1, -1):
                c = gazN[L2].get(tuple(norm[pos:pos + L2]))
                if c is not None:
                    cat, L = c, L2
                    break
        if cat is None:
            cat = cat1[pos]
            if cat is None:
                continue
        r = row_of[pos]
        s = pos - row_start[r]
        out.setdefault(r, []).append((s, s + L, cat))
        nf = pos + L
    return out


_MISS = object()
_PAIRBASE = np.int64(2_097_152)  # > the registry's 2M-vocab backstop


def _greedy_spans2(codes: np.ndarray, norm_by_code: np.ndarray,
                   cat1: np.ndarray, bif: np.ndarray, row_of: np.ndarray,
                   row_start: np.ndarray, row_end: np.ndarray,
                   gaz2, pair_cache: dict):
    """max_len==2 specialization of ``_greedy_spans``: the two-word
    gazetteer probe (the bulk of the hit positions) is resolved for the
    whole batch at once — one packed-code-pair key per position,
    ``np.unique`` collapses them, and the tuple build + dict probe runs
    once per DISTINCT pair via a persistent memo. The greedy
    left-to-right scan then touches precomputed values only."""
    out: dict[int, list[tuple[int, int, str]]] = {}
    hits = np.flatnonzero(bif | (cat1 != None))  # noqa: E711
    if len(hits) == 0:
        return out
    rh = row_of[hits]
    fit2 = bif[hits] & (hits + 2 <= row_end[rh])
    cat2 = np.full(len(hits), None, dtype=object)
    if fit2.any():
        p2 = hits[fit2]
        pk = codes[p2] * _PAIRBASE + codes[p2 + 1]
        uk, inv = np.unique(pk, return_inverse=True)
        vals = []
        for k in uk.tolist():
            v = pair_cache.get(k, _MISS)
            if v is _MISS:
                c1, c2 = divmod(k, 2_097_152)
                v = gaz2.get((norm_by_code[c1], norm_by_code[c2]))
                pair_cache[k] = v
            vals.append(v)
        cat2[fit2] = np.array(vals, dtype=object)[inv]
    hl = hits.tolist()
    c2l = cat2.tolist()
    c1l = cat1[hits].tolist()
    rl = rh.tolist()
    rsl = row_start
    nf = -1
    for i, pos in enumerate(hl):
        if pos < nf:
            continue
        cat = c2l[i]
        L = 2
        if cat is None:
            cat = c1l[i]
            if cat is None:
                continue
            L = 1
        r = rl[i]
        s = pos - int(rsl[r])
        out.setdefault(r, []).append((s, s + L, cat))
        nf = pos + L
    return out


def _find_rel(lower: np.ndarray, rel1: np.ndarray, relf: np.ndarray,
              g0: int, g1: int, relN, rel_max: int):
    """relation_candidates inner scan: positions left to right, phrases
    longest-first at each position, phrase must fit inside the gap."""
    if rel_max == 2:  # no slice/tuple build on the common shape
        rel2 = relN[2]
        for p in range(g0, g1):
            if relf[p] and p + 2 <= g1:
                pred = rel2.get((lower[p], lower[p + 1]))
                if pred is not None:
                    return pred
            pr = rel1[p]
            if pr is not None:
                return pr
        return None
    for p in range(g0, g1):
        if relf[p]:
            for L2 in range(min(rel_max, g1 - p), 1, -1):
                pred = relN[L2].get(tuple(lower[p:p + L2]))
                if pred is not None:
                    return pred
        pr = rel1[p]
        if pr is not None:
            return pr
    return None


def _tokenize_batch(texts: list[str]):
    """One regex pass over the joined texts. Returns (flat tokens list,
    per-row counts)."""
    if any(_SEP in t for t in texts):  # sentinel collision: rare, exact
        per_row = [_TOKEN_RE.findall(t) for t in texts]
        return [t for row in per_row for t in row], [len(r) for r in per_row]
    toks = _TOKEN_RE.findall(_SEP.join(texts))
    flat: list[str] = []
    counts: list[int] = []
    c = 0
    for t in toks:
        if t == _SEP:
            counts.append(c)
            c = 0
        else:
            flat.append(t)
            c += 1
    counts.append(c)
    return flat, counts


class BatchKgExtractor:
    """Stateful (actor-resident) vectorized extractor. ``extract``
    returns, per input row, (mentions, rels) in the exact format of
    kg_mentions / relation_candidates."""

    def __init__(self) -> None:
        self.reg = _Registry()

    def _rels_for(self, ments, lower, rel1, relf, base: int, relpre):
        reg = self.reg
        out = []
        for i in range(len(ments) - 1):
            end1 = ments[i][3]
            st2 = ments[i + 1][2]
            gap = st2 - end1
            if gap < 1 or gap > MAX_REL_GAP:
                continue
            g0 = base + end1
            g1 = base + st2
            # prefix-sum skip: no rel-phrase first word and no one-word
            # relation anywhere in the gap -> _find_rel cannot match
            if relpre[g1] == relpre[g0]:
                continue
            pred = _find_rel(lower, rel1, relf, g0, g1,
                             reg.relN, reg.rel_max)
            if pred is not None:
                out.append((i, pred, i + 1))
        return out

    def extract(self, texts: list[str]):
        n_rows = len(texts)
        if n_rows == 0:
            return []
        if n_rows > 64:
            # per-batch text dedupe: ~a quarter of corpus turns are
            # exact repeats and extraction is a pure function of the
            # text, so run the chain once per DISTINCT text and fan the
            # results back out (shared tuples; immutable downstream)
            enc = pa.array(texts, pa.string()).dictionary_encode()
            uniq = enc.dictionary.to_pylist()
            if len(uniq) < n_rows:
                res = self._extract_unique(uniq)
                idx = enc.indices.to_numpy(zero_copy_only=False)
                return [res[i] for i in idx.tolist()]
        return self._extract_unique(texts)

    def _extract_unique(self, texts: list[str]):
        n_rows = len(texts)
        reg = self.reg
        flat, counts = _tokenize_batch(texts)
        codes = reg.encode(flat)

        counts_a = np.asarray(counts, dtype=np.int64)
        row_end_a = np.cumsum(counts_a)
        row_start_a = row_end_a - counts_a
        row_of_a = np.repeat(np.arange(n_rows, dtype=np.int64), counts_a)

        # slow (apostrophe-bearing) rows: expand every token's memoized
        # MD morphemes into ONE concatenated form stream, encode + span
        # match it in a single vectorized pass (morph_hybrid track).
        # Stream geometry (starts/ends/last-morph) is all cumsum math
        # over the per-code morph counts — no per-row Python loop.
        slow_a = np.fromiter(("'" in t for t in texts), bool, n_rows)
        morphs9 = reg._cols[9]
        n_slow = int(slow_a.sum())
        if n_slow:
            spos = np.flatnonzero(np.repeat(slow_a, counts_a))
            scodes = codes[spos]
            forms = list(chain.from_iterable(
                map(morphs9.__getitem__, scodes.tolist())))
            cnts = reg.morph_counts()[scodes]
            srow_toks = counts_a[slow_a]
            tok_off = np.concatenate(([0], np.cumsum(srow_toks)))
            cum0 = np.concatenate(([0], np.cumsum(cnts)))
            s_starts_a = cum0[tok_off[:-1]]
            s_ends_a = cum0[tok_off[1:]]
            s_row_of_a = np.repeat(np.arange(n_slow, dtype=np.int64),
                                   s_ends_a - s_starts_a)
            # per-token index of its LAST morpheme, relative to the
            # row's form-stream start
            lm_flat = (cum0[1:] - 1 - np.repeat(s_starts_a, srow_toks)
                       ).tolist()
            tok_off_l = tok_off.tolist()
            fc = reg.encode(forms)
        else:
            forms = []
            fc = None
        cols = reg.arrays()  # fetch once, after ALL registrations

        two = reg.max_len == 2
        if two:
            spans_a = _greedy_spans2(codes, cols[0], cols[1][codes],
                                     cols[2][codes], row_of_a, row_start_a,
                                     row_end_a, reg.gazN[2], reg.pair_core)
        else:
            spans_a = _greedy_spans(cols[0][codes], cols[1][codes],
                                    cols[2][codes], row_of_a, row_start_a,
                                    row_end_a, reg.gazN, reg.max_len)
        lo = cols[6][codes]
        rf = cols[7][codes]
        r1 = cols[8][codes]
        relpre = np.concatenate(
            ([0], np.cumsum(rf | (r1 != None)))).tolist()  # noqa: E711

        if fc is not None:
            if two:
                spans_b = _greedy_spans2(fc, cols[3], cols[4][fc],
                                         cols[5][fc], s_row_of_a, s_starts_a,
                                         s_ends_a, reg.gazN[2], reg.pair_form)
            else:
                spans_b = _greedy_spans(cols[3][fc], cols[4][fc],
                                        cols[5][fc], s_row_of_a, s_starts_a,
                                        s_ends_a, reg.gazN, reg.max_len)
            flo = cols[6][fc]
            frf = cols[7][fc]
            fr1 = cols[8][fc]
            frelpre = np.concatenate(
                ([0], np.cumsum(frf | (fr1 != None)))).tolist()  # noqa: E711
        else:
            spans_b = {}

        row_start_l = row_start_a.tolist()
        slow_l = slow_a.tolist()
        results: list[tuple[list, list]] = []
        sr = -1
        for r in range(n_rows):
            rs = row_start_l[r]
            if not slow_l[r]:
                spans = spans_a.get(r)
                if not spans:
                    results.append(([], []))
                    continue
                seen: dict[tuple[str, str], int] = {}
                ments = []
                for st, en, cat in spans:
                    surface = " ".join(flat[rs + st:rs + en])
                    k = (surface, cat)
                    seen[k] = seen.get(k, 0) + 1
                    ments.append((surface, cat, st, en, seen[k]))
                rels = self._rels_for(ments, lo, r1, rf, rs, relpre) \
                    if len(ments) >= 2 else []
                results.append((ments, rels))
            else:
                sr += 1
                results.append(self._slow_row(
                    forms, int(s_starts_a[sr]),
                    lm_flat[tok_off_l[sr]:tok_off_l[sr + 1]],
                    spans_a.get(r, ()), spans_b.get(sr, ()),
                    flo, fr1, frf, frelpre))
        return results

    def _slow_row(self, forms, s0, last_morph, core_spans, base_spans,
                  flo, fr1, frf, frelpre):
        """Assemble one apostrophe-bearing turn from the two batch span
        passes: base (morph_hybrid) spans over the MD forms, plus
        multi_align extras derived from the token-core spans, merged per
        kg_mentions. base_spans are local to this row; forms/flo/... are
        the batch-wide stream with this row at offset s0."""
        base = [(forms[s0 + st] if en - st == 1
                 else " ".join(forms[s0 + st:s0 + en]), cat, st, en, 0)
                for st, en, cat in base_spans]

        # multi_align extras: soft-merge puts the token's core tag on its
        # LAST morpheme and O elsewhere, so (per the parse_spans O-abort
        # rule) a multi-token core span survives on the morph axis iff
        # every non-first member token has exactly one morpheme; a
        # single-token (S) span always survives. occ is recomputed after
        # the merge, so extras carry a placeholder.
        extras = []
        for st, en, cat in core_spans:
            if en - st == 1:
                p = last_morph[st]
                extras.append((forms[s0 + p], cat, p, p + 1, 0))
            elif en - st == 2:  # the gazetteer's longest phrase
                if last_morph[st + 1] - last_morph[st] == 1:
                    lo_, hi = last_morph[st], last_morph[st + 1] + 1
                    extras.append((" ".join(forms[s0 + lo_:s0 + hi]),
                                   cat, lo_, hi, 0))
            else:
                if all(last_morph[t] - last_morph[t - 1] == 1
                       for t in range(st + 1, en)):
                    lo_, hi = last_morph[st], last_morph[en - 1] + 1
                    extras.append((" ".join(forms[s0 + lo_:s0 + hi]),
                                   cat, lo_, hi, 0))

        taken = [(st, en) for _s, _l, st, en, _o in base]
        merged = list(base)
        for m in extras:
            _s, _l, st, en, _o = m
            if all(en <= bst or st >= ben for bst, ben in taken):
                merged.append(m)
        merged.sort(key=lambda m: (m[2], m[3]))
        seen: dict[tuple[str, str], int] = {}
        ments = []
        for surface, label, st, en, _occ in merged:
            k = (surface, label)
            seen[k] = seen.get(k, 0) + 1
            ments.append((surface, label, st, en, seen[k]))

        rels = self._rels_for(ments, flo, fr1, frf, s0, frelpre) \
            if len(ments) >= 2 else []
        return ments, rels


def extract_packs(extractor: BatchKgExtractor, batch: pa.Table,
                  num_buckets: int,
                  skip_buckets: frozenset = frozenset()) -> pa.Table:
    """KgTurnProcessor.__call__ body: vectorized extract + map-side
    partition packing (one columnar payload row per conv-hash bucket,
    engine.colresolve.pack_entries — dictionary-encoded strings + flat
    numpy arrays under zlib-1). The reassembly exchange is
    object-store / network bound (remote wall ~6x remote CPU on the
    shuffle split tasks at sf0.1); the columnar payload is ~1.15x
    smaller on the wire than the old pickled-tuples format and decodes
    ~7x faster on the resolve side (see engine/colresolve.py)."""
    from .colresolve import pack_bucket_payloads

    texts = batch["text"].to_pylist()
    conv_ids = batch["conv_id"].to_pylist()
    turn_idxs = batch["turn_idx"].to_pylist()
    fnv_memo: dict[str, int] = {}  # turns of one conv arrive together
    if skip_buckets:
        # resume keep-filter, fused INSIDE the UDF on purpose: a
        # separate map_batches(keep) stage emits 0-row TRANSCRIPT-
        # schema blocks when a whole block's buckets are complete, Ray
        # skips downstream UDFs on empty blocks, and the schema-less
        # block then kills the hash shuffle keyed on 'bucket'
        # (observed: resume crash once most buckets were done). Here
        # the actor always sees the original non-empty block and
        # always returns the typed pack schema.
        kept = []
        for i, c in enumerate(conv_ids):
            h = fnv_memo.get(c)
            if h is None:
                h = fnv_memo[c] = _fnv64(c)
            if h % num_buckets not in skip_buckets:
                kept.append(i)
        if len(kept) != len(conv_ids):
            texts = [texts[i] for i in kept]
            conv_ids = [conv_ids[i] for i in kept]
            turn_idxs = [turn_idxs[i] for i in kept]
    results = extractor.extract(texts)
    packs: dict[int, list] = {}
    for conv_id, turn_idx, (ments, rels) in zip(conv_ids, turn_idxs, results):
        if not ments:
            continue
        h = fnv_memo.get(conv_id)
        if h is None:
            h = fnv_memo[conv_id] = _fnv64(conv_id)
        sid = ((h >> 1) & ~0xFFFFF) | (turn_idx & 0xFFFFF)
        packs.setdefault(h % num_buckets, []).append(
            (conv_id, turn_idx, sid, ments, rels))
    buckets, payloads = pack_bucket_payloads(packs)
    return pa.table(
        {
            "bucket": pa.array(buckets, pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _ments_from_spans(spans, surfaces: list[str]):
    """[(st, en, cat)] + member surfaces -> [(surface, label, st, en,
    occ)] with the per-(surface, label) multiset index assigned in scan
    order (ne_evaluate_mentions.py:116-122 semantics)."""
    seen: dict[tuple[str, str], int] = {}
    out = []
    for st, en, cat in spans:
        surface = " ".join(surfaces[st:en])
        k = (surface, cat)
        seen[k] = seen.get(k, 0) + 1
        out.append((surface, cat, st, en, seen[k]))
    return out


def _survivor_spans(core_spans, last_morph):
    """multi_align reduction (module docstring): which token-core spans
    survive soft-merge onto the morph axis, in morph coordinates."""
    out = []
    for st, en, cat in core_spans:
        if en - st == 1:
            p = last_morph[st]
            out.append((p, p + 1, cat))
        elif all(last_morph[t] - last_morph[t - 1] == 1
                 for t in range(st + 1, en)):
            out.append((last_morph[st], last_morph[en - 1] + 1, cat))
    return out


def _token_tags_from_form_spans(form_spans, tok_counts: list[int]
                                ) -> list[str]:
    """morph_hybrid_tok fold (nemo.py:217-226 semantics): expand the
    morph-axis spans to per-morpheme BIOSE, group by token, fix each
    touched token's intra-token sequence to one tag. Untouched tokens
    are all-O -> 'O' without calling the fix chain (an all-O sequence
    can never fix to a span tag, and only span tags affect mentions)."""
    from .ops.labels import get_fixed_bio_sequence

    nf = sum(tok_counts)
    lab = ["O"] * nf
    touched = [False] * len(tok_counts)
    bounds = []
    pos = 0
    for c in tok_counts:
        bounds.append((pos, pos + c))
        pos += c
    for st, en, cat in form_spans:
        if en - st == 1:
            lab[st] = "S-" + cat
        else:
            lab[st] = "B-" + cat
            for j in range(st + 1, en - 1):
                lab[j] = "I-" + cat
            lab[en - 1] = "E-" + cat
    # mark tokens whose morph range intersects any span
    ti = 0
    for st, en, _cat in form_spans:
        for ti in range(len(bounds)):
            b0, b1 = bounds[ti]
            if b1 > st and b0 < en:
                touched[ti] = True
    tags = []
    for ti, (b0, b1) in enumerate(bounds):
        tags.append(
            get_fixed_bio_sequence(tuple(lab[b0:b1])) if touched[ti] else "O")
    return tags


class BatchMentionExtractor:
    """Vectorized batch implementation of SentenceProcessor +
    scenario_mentions for ALL five scenario levels (the engine.pipeline
    MentionExtractor surface; VERDICT r3 #4): one regex tokenize pass,
    one token-core span pass (token_single and every level of
    apostrophe-free rows), and for apostrophe-bearing rows two more
    batch span passes over the memoized pruned-MD and unpruned-YAP form
    streams. tests/test_fastpath.py asserts literal equality with the
    per-row reference path level by level."""

    def __init__(self, levels: tuple[str, ...] | None = None) -> None:
        from .kgflow import SCENARIOS

        self.reg = _Registry()
        self.levels = tuple(levels) if levels else SCENARIOS

    def extract(self, texts: list[str]) -> list[dict[str, list[tuple]]]:
        n_rows = len(texts)
        if n_rows == 0:
            return []
        if n_rows > 64:
            # per-batch text dedupe (same as BatchKgExtractor.extract):
            # results are per-text pure and consumed read-only
            enc = pa.array(texts, pa.string()).dictionary_encode()
            uniq = enc.dictionary.to_pylist()
            if len(uniq) < n_rows:
                res = self._extract_unique(uniq)
                idx = enc.indices.to_numpy(zero_copy_only=False)
                return [res[i] for i in idx.tolist()]
        return self._extract_unique(texts)

    def _extract_unique(self, texts: list[str]) -> list[dict[str, list[tuple]]]:
        from .ops.spans import mentions_with_occ

        levels = self.levels
        lv = set(levels)
        n_rows = len(texts)
        reg = self.reg
        flat, counts = _tokenize_batch(texts)
        codes = reg.encode(flat)

        row_start: list[int] = []
        row_of: list[int] = []
        s = 0
        for r, c in enumerate(counts):
            row_start.append(s)
            row_of.extend([r] * c)
            s += c
        row_end = [a + c for a, c in zip(row_start, counts)]

        need_forms = bool(lv & {"multi_align", "morph_hybrid",
                                "morph_hybrid_tok"})
        need_yap = "morph_yap" in lv
        slow = ["'" in t for t in texts]

        # build the slow-row form streams BEFORE fetching any arrays
        # (encode may register new strings and rebuild the mirrors)
        morphs9 = reg._cols[9]
        yap10 = reg._cols[10]
        forms: list[str] = []
        yforms: list[str] = []
        h_start: dict[int, int] = {}
        y_start: dict[int, int] = {}
        h_row_of: list[int] = []
        y_row_of: list[int] = []
        h_starts: list[int] = []
        h_ends: list[int] = []
        y_starts: list[int] = []
        y_ends: list[int] = []
        tok_counts: dict[int, list[int]] = {}
        last_morph: dict[int, list[int]] = {}
        for r in range(n_rows):
            if not slow[r]:
                continue
            sr = len(h_starts)
            if need_forms:
                s0 = len(forms)
                h_start[r] = s0
                cnts: list[int] = []
                lm: list[int] = []
                for pos in range(row_start[r], row_end[r]):
                    m = morphs9[codes[pos]]
                    forms.extend(m)
                    cnts.append(len(m))
                    lm.append(len(forms) - s0 - 1)
                tok_counts[r] = cnts
                last_morph[r] = lm
                h_row_of.extend([sr] * (len(forms) - s0))
                h_starts.append(s0)
                h_ends.append(len(forms))
            if need_yap:
                s0 = len(yforms)
                y_start[r] = s0
                for pos in range(row_start[r], row_end[r]):
                    yforms.extend(yap10[codes[pos]])
                y_row_of.extend([len(y_starts)] * (len(yforms) - s0))
                y_starts.append(s0)
                y_ends.append(len(yforms))

        fc = reg.encode(forms) if forms else None
        yc = reg.encode(yforms) if yforms else None
        cols = reg.arrays()  # fetch once, after ALL registrations

        if reg.max_len == 2:
            def _spans(cds, view, ro, rs, re_, cache):
                return _greedy_spans2(
                    cds, cols[0] if view == 0 else cols[3],
                    cols[1 if view == 0 else 4][cds],
                    cols[2 if view == 0 else 5][cds],
                    np.asarray(ro, dtype=np.int64),
                    np.asarray(rs, dtype=np.int64),
                    np.asarray(re_, dtype=np.int64),
                    reg.gazN[2], cache)

            spans_a = _spans(codes, 0, row_of, row_start, row_end,
                             reg.pair_core)
            spans_b = (_spans(fc, 1, h_row_of, h_starts, h_ends,
                              reg.pair_form) if fc is not None else {})
            spans_c = (_spans(yc, 1, y_row_of, y_starts, y_ends,
                              reg.pair_form) if yc is not None else {})
        else:
            spans_a = _greedy_spans(cols[0][codes], cols[1][codes],
                                    cols[2][codes], row_of, row_start,
                                    row_end, reg.gazN, reg.max_len)
            spans_b = (_greedy_spans(cols[3][fc], cols[4][fc], cols[5][fc],
                                     h_row_of, h_starts, h_ends,
                                     reg.gazN, reg.max_len)
                       if fc is not None else {})
            spans_c = (_greedy_spans(cols[3][yc], cols[4][yc], cols[5][yc],
                                     y_row_of, y_starts, y_ends,
                                     reg.gazN, reg.max_len)
                       if yc is not None else {})

        results: list[dict[str, list[tuple]]] = []
        sr = -1
        for r in range(n_rows):
            rs, re_ = row_start[r], row_end[r]
            toks = flat[rs:re_]
            core_spans = spans_a.get(r, ())
            if not slow[r]:
                # every level reduces to the token-core span pass
                ml = _ments_from_spans(core_spans, toks)
                results.append({lvl: ml for lvl in levels})
                continue
            sr += 1
            out: dict[str, list[tuple]] = {}
            if "token_single" in lv:
                out["token_single"] = _ments_from_spans(core_spans, toks)
            if need_forms:
                row_forms = forms[h_starts[sr]:h_ends[sr]]
                bspans = spans_b.get(sr, ())
                if "morph_hybrid" in lv:
                    out["morph_hybrid"] = _ments_from_spans(bspans, row_forms)
                if "multi_align" in lv:
                    out["multi_align"] = _ments_from_spans(
                        _survivor_spans(core_spans, last_morph[r]), row_forms)
                if "morph_hybrid_tok" in lv:
                    tags = _token_tags_from_form_spans(bspans, tok_counts[r])
                    out["morph_hybrid_tok"] = mentions_with_occ(toks, tags)
            if need_yap:
                out["morph_yap"] = _ments_from_spans(
                    spans_c.get(sr, ()), yforms[y_starts[sr]:y_ends[sr]])
            results.append({lvl: out[lvl] for lvl in levels})
        return results


class BatchDepExtractor:
    """Vectorized batch analog of SentenceProcessor(with_dep=True) for
    the DEP_TURNS surface (VERDICT r3 #4): the per-turn morpheme list
    comes from the memoized per-token pruned-MD segmentation (registry
    col 9 == md_select(prune_lattice(...)) per token), dep_info is the
    cheap per-turn zip (ops/lattice.py:237)."""

    def __init__(self) -> None:
        self.reg = _Registry()

    def extract(self, texts: list[str]):
        """Per row: (morph_forms, morph_token_ids, dep_info)."""
        n_rows = len(texts)
        if n_rows > 64:
            # per-batch text dedupe (same as BatchKgExtractor.extract)
            enc = pa.array(texts, pa.string()).dictionary_encode()
            uniq = enc.dictionary.to_pylist()
            if len(uniq) < n_rows:
                res = self._extract_unique(uniq)
                idx = enc.indices.to_numpy(zero_copy_only=False)
                return [res[i] for i in idx.tolist()]
        return self._extract_unique(texts)

    def _extract_unique(self, texts: list[str]):
        from .ops.lattice import dep_info

        flat, counts = _tokenize_batch(texts)
        codes = self.reg.encode(flat)
        morphs9 = self.reg._cols[9]
        results = []
        pos = 0
        for c in counts:
            morphs: list[tuple[str, int]] = []
            for tid in range(1, c + 1):
                for f in morphs9[codes[pos + tid - 1]]:
                    morphs.append((f, tid))
            pos += c
            results.append(([f for f, _ in morphs],
                            [t for _, t in morphs],
                            dep_info(morphs)))
        return results
