"""Alphabet/vocab (utils/alphabet.py semantics), positional span eval
(utils/metric.py semantics), n-best decode surface."""

import pyarrow as pa


def test_alphabet_semantics():
    from engine.vocab import UNK, Alphabet

    a = Alphabet("word")
    i1 = a.add("hello")
    assert a.get_index("hello") == i1
    assert a.get_instance(i1) == "hello"
    assert a.get_instance(0) is None          # index 0 reserved
    grow = a.get_index("new")                  # growing: adds
    assert a.get_instance(grow) == "new"
    a.close()
    assert a.get_index("never-seen") == a.get_index(UNK)  # closed: UNK
    # round trip
    b = Alphabet.from_json(a.to_json())
    assert b.get_index("hello") == a.get_index("hello")
    assert b.get_index("xyz") == b.get_index(UNK)


def test_build_vocab_and_encode(ray_session):
    import ray.data as rd

    from engine.vocab import build_vocab, encode_tokens

    rows = [{"tokens": ["a", "b", "a", "42"]}, {"tokens": ["b", "a"]}]
    ds = rd.from_items(rows)
    alpha = build_vocab(ds)
    # deterministic: a (3) < ... ids by count desc then lex
    assert alpha.get_index("a") < alpha.get_index("b")
    assert alpha.get_index("00") > 0  # digit-normalized "42"
    enc = encode_tokens([["a", "b"], ["zzz"]], alpha)
    assert enc[0][0] == alpha.get_index("a")
    assert enc[1][0] == alpha.get_index("</unk>")
    # overlong sentences drop (MAX_SENTENCE_LENGTH analog)
    assert encode_tokens([["x"] * 300], alpha) == []


def test_positional_f1():
    from engine.eval import positional_f1

    gold = [["B-PER", "E-PER", "O", "S-ORG"]]
    pred = [["B-PER", "E-PER", "O", "O"]]
    acc, p, r, f = positional_f1(gold, pred)
    assert p == 1.0 and r == 0.5 and acc == 0.75
    acc2, p2, r2, f2 = positional_f1(gold, gold)
    assert (p2, r2, f2) == (1.0, 1.0, 1.0)


def test_nbest_decode():
    from engine.scorers import TokenSingleScorer

    sc = TokenSingleScorer()
    toks = "Alice Cohen met Globex .".split()
    nb = sc.label_nbest(toks, n=3)
    assert nb[0][1] == 1.0 and nb[0][0][0] == "B-PER"
    assert nb[1][1] == 0.9 and nb[1][0][3] == "O"  # rightmost span dropped
    assert len(nb) == 3
    assert nb[2][0] == ["O"] * 5
