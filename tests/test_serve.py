"""HTTP serving surface (engine/serve.py) — the reference's six
FastAPI endpoints (api_main.py:470-742) on the stdlib server. The
dispatcher is tested as a pure function; one live-socket test proves
the HTTP plumbing (routing, query params, JSON codec, error paths).
No Ray involvement anywhere here by design."""

import json
import threading
import urllib.request

import pytest

TEXT = "Alice Cohen visited be'Tel Aviv"


@pytest.fixture(scope="module")
def models():
    from engine.serve import _Models

    return _Models()


def _call(models, command, sentences=TEXT, tokenized=False, **params):
    from engine.serve import handle_command

    q = {k: [str(v)] for k, v in params.items()}
    return handle_command(models, command,
                          {"sentences": sentences,
                           "tokenized": tokenized}, q)


def test_run_ncrf_model_matches_scorers(models):
    from engine.ops.tokenize import tokenize

    toks = tokenize(TEXT)
    for name, scorer in [("token_single", models.get("joint").single),
                         ("token_multi", models.get("joint").multi)]:
        out = _call(models, "run_ncrf_model", model_name=name)
        assert out == [{"tokenized_text": toks,
                        "ncrf_preds": scorer.label(toks)}]


def test_multi_to_single_collapses_fused_tags(models):
    from engine.ops.labels import fix_multi_biose

    out = _call(models, "multi_to_single")
    (doc,) = out
    rec = models.get("joint").process(TEXT, levels=())
    got = [t["nemo_multi_align_token"] for t in doc["tokens"]]
    assert got == [fix_multi_biose(x) for x in rec["labels_multi"]]
    assert doc["ents"] == {}  # this endpoint certifies no span scenario


def test_each_endpoint_certifies_only_its_scenario(models):
    for cmd, lvls in [("morph_yap", {"morph_yap"}),
                      ("multi_align_hybrid", {"multi_align"}),
                      ("morph_hybrid", {"morph_hybrid"}),
                      ("morph_hybrid_align_tokens",
                       {"morph_hybrid", "morph_hybrid_tok"})]:
        (doc,) = _call(models, cmd)
        assert set(doc["ents"]) <= lvls
        assert doc["ents"], cmd  # the PER mention must surface


def test_tokenized_passthrough_and_multiline(models):
    out = _call(models, "morph_hybrid",
                sentences=[["Dana", "Levi"], ["met", "be'Acme"]],
                tokenized=True)
    assert len(out) == 2
    assert [t["text"] for t in out[0]["tokens"]] == ["Dana", "Levi"]
    two = _call(models, "morph_hybrid", sentences="Dana Levi\nmet Bob")
    assert len(two) == 2


def test_empty_and_bad_inputs(models):
    assert _call(models, "morph_hybrid", sentences="  \n ") == []
    with pytest.raises(ValueError):
        _call(models, "morph_hybrid", sentences=[["a"]], tokenized=False)
    with pytest.raises(ValueError):
        _call(models, "run_ncrf_model", model_name="nope")
    with pytest.raises(ValueError):
        _call(models, "morph_hybrid", md_variant="nope")


def test_verbosity_and_lattice_params_reach_docjson(models):
    (d0,) = _call(models, "morph_hybrid")
    (d2,) = _call(models, "morph_hybrid", verbosity=2,
                  include_yap_outputs="true")
    assert "nemo_multi" not in d0["tokens"][0]
    assert "nemo_multi" in d2["tokens"][0] and "dep_tree" in d2
    assert "ma_lattice" in d2 and "ma_lattice" not in d0


def test_http_roundtrip():
    """Live socket: GET / lists commands; POST runs a command; unknown
    command 404s; bad JSON 400s — the reference's route surface."""
    from engine.serve import AVAILABLE_COMMANDS, make_server

    srv = make_server(port=0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/") as r:
            root = json.loads(r.read())
        assert root["available_commands"] == AVAILABLE_COMMANDS

        req = urllib.request.Request(
            base + "/morph_hybrid?verbosity=1",
            data=json.dumps({"sentences": TEXT}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            docs = json.loads(r.read())
        assert len(docs) == 1 and docs[0]["ents"]["morph_hybrid"]
        assert "nemo_multi" in docs[0]["tokens"][0]

        bad = urllib.request.Request(base + "/no_such", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 404

        malformed = urllib.request.Request(base + "/morph_hybrid",
                                           data=b"{not json")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(malformed)
        assert ei.value.code == 400

        invalid = urllib.request.Request(
            base + "/run_ncrf_model?model_name=nope",
            data=json.dumps({"sentences": TEXT}).encode())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(invalid)
        assert ei.value.code == 422
    finally:
        srv.shutdown()
        srv.server_close()
