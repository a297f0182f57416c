"""HTTP serving surface — the reference's six FastAPI endpoints
(api_main.py:470-742) as a stdlib ``http.server`` service (FastAPI is
not in this sandbox; the stdlib server keeps the engine dependency-
free). Semantics mirrored from the reference:

  GET  /                        list available commands (api_main.py:503-509)
  POST /run_ncrf_model          raw sequence labels, no segmentation
                                (api_main.py:523-542); ?model_name=
                                token_single|token_multi|morph
  POST /multi_to_single         token-level labels from the multi model
                                via fix_multi_biose (api_main.py:545-570)
  POST /morph_yap               MA+MD segmentation only, no NER
                                (api_main.py:573-611)
  POST /multi_align_hybrid      multi labels soft-merged onto morphemes
                                (api_main.py:614-663)
  POST /morph_hybrid            pruned-lattice MD + morph NER
                                (api_main.py:666-729)
  POST /morph_hybrid_align_tokens  + morph labels aligned back to
                                tokens (api_main.py:732-742)

Request body is the NEMOQuery shape (api_main.py:490-500):
``{"sentences": "line\\nline" | [[tok, ...], ...], "tokenized": bool}``.
Query params: ``verbosity=0|1|2`` (schema.py:32-35 ladder, same as
engine/docjson.py) and ``include_yap_outputs=true`` where the
reference offers them; ``md_variant=joint|md`` exposes the API route's
standalone-MD divergence (api_main.py:133-137).

Models load ONCE at server start (the reference's startup hook,
api_main.py:512-520) — one SentenceProcessor per md_variant, shared by
requests under a lock-free read pattern (scorers are stateless after
__init__). Concurrency is capped at 5 in-flight requests with a
semaphore, mirroring MAX_THREADS_FASTAPI=5 (reference config.py:31).

This is the REQUEST-level surface for parity with the reference; the
batch surface (queries()/CLI) remains the engine's main track, so the
server deliberately does NOT start Ray — per-request work is the same
pure per-sentence chain the actor stages run, and a Ray round-trip per
HTTP request would add latency for zero throughput at request scale.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .docjson import to_doc
from .kgflow import SentenceProcessor
from .ops.labels import fix_multi_biose
from .ops.tokenize import tokenize

AVAILABLE_COMMANDS = [
    "run_ncrf_model", "multi_to_single", "morph_yap",
    "multi_align_hybrid", "morph_hybrid", "morph_hybrid_align_tokens",
]

# endpoint -> the scenario(s) whose entity spans it certifies; the Doc
# body is the shared verbosity-gated shape, but "ents" carries only the
# endpoint's own scenario (the reference's response_model_exclude_unset
# discipline: each route returns its scenario's fields, not the union)
_ENDPOINT_LEVELS = {
    "multi_to_single": (),
    "morph_yap": ("morph_yap",),
    "multi_align_hybrid": ("multi_align",),
    "morph_hybrid": ("morph_hybrid",),
    "morph_hybrid_align_tokens": ("morph_hybrid", "morph_hybrid_tok"),
}

MAX_INFLIGHT = 5  # reference MAX_THREADS_FASTAPI (config.py:31)


def get_request_sents(payload: dict) -> list[list[str]]:
    """The reference's get_sents routing (api_main.py:83-90): raw text
    splits on newlines and tokenizes; tokenized input passes through."""
    sentences = payload.get("sentences", "")
    if payload.get("tokenized"):
        if not isinstance(sentences, list):
            raise ValueError("tokenized=true requires [[token, ...]]")
        return [list(map(str, s)) for s in sentences]
    if not isinstance(sentences, str):
        raise ValueError("tokenized=false requires a string body")
    return [tokenize(line) for line in sentences.split("\n")
            if line.strip()]


class _Models:
    """Startup-loaded model registry (api_main.py:512-520 analog):
    one SentenceProcessor per md_variant, built eagerly so the first
    request doesn't pay scorer construction."""

    def __init__(self) -> None:
        self.by_variant = {v: SentenceProcessor(md_variant=v)
                           for v in ("joint", "md")}

    def get(self, md_variant: str) -> SentenceProcessor:
        if md_variant not in self.by_variant:
            raise ValueError(f"unknown md_variant: {md_variant}")
        return self.by_variant[md_variant]


def handle_command(models: _Models, command: str, payload: dict,
                   params: dict) -> list | dict:
    """Pure request dispatcher (no sockets) — unit-testable, and the
    HTTP layer below is a thin wrapper around it."""
    verbosity = int(params.get("verbosity", ["0"])[0])
    md_variant = params.get("md_variant", ["joint"])[0]
    include_lattices = (params.get("include_yap_outputs", ["false"])[0]
                        .lower() == "true")
    sp = models.get(md_variant)
    sents = get_request_sents(payload)
    if not sents:
        return []

    if command == "run_ncrf_model":
        model_name = params.get("model_name", ["token_single"])[0]
        scorer = {"token_single": sp.single, "token_multi": sp.multi,
                  "morph": sp.morph}.get(model_name)
        if scorer is None:
            raise ValueError(f"unknown model_name: {model_name}")
        return [{"tokenized_text": toks, "ncrf_preds": scorer.label(toks)}
                for toks in sents]

    if command not in _ENDPOINT_LEVELS:
        raise KeyError(command)

    levels = _ENDPOINT_LEVELS[command]
    docs = []
    for toks in sents:
        # the Doc path re-joins and re-tokenizes; faithful because the
        # engine tokenizer is idempotent on its own output (space-
        # separated tokens round-trip). Caller tokens containing
        # internal whitespace would re-split — same as the reference's
        # space-joined create_input_file round-trip (nemo.py:34-49).
        text = " ".join(toks)
        doc = to_doc(text, sp, verbosity=verbosity,
                     include_lattices=include_lattices)
        doc["ents"] = {lvl: m for lvl, m in doc["ents"].items()
                       if lvl in levels}
        if command == "multi_to_single":
            # token-level labels from the multi model, one fused tag
            # collapsed per token (api_main.py:545-570)
            rec = sp.process(text, levels=())
            for tok, lab in zip(doc["tokens"], rec["labels_multi"]):
                tok["nemo_multi_align_token"] = fix_multi_biose(lab)
        docs.append(doc)
    return docs


class _Handler(BaseHTTPRequestHandler):
    server_version = "nemo-ray-engine"

    def _send(self, status: int, obj) -> None:
        body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a) -> None:  # quiet by default
        pass

    def do_GET(self) -> None:
        self._send(200, {
            "message": ("Please specify command in URL path in a POST "
                        "request and provide some input text in the "
                        "request body."),
            "available_commands": AVAILABLE_COMMANDS})

    def do_POST(self) -> None:
        url = urlparse(self.path)
        command = url.path.strip("/")
        if command not in AVAILABLE_COMMANDS:
            self._send(404, {"error": f"unknown command: {command}",
                             "available_commands": AVAILABLE_COMMANDS})
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            payload = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError) as exc:
            self._send(400, {"error": f"bad request body: {exc}"})
            return
        sem: threading.Semaphore = self.server.inflight  # type: ignore
        with sem:
            try:
                out = handle_command(self.server.models,  # type: ignore
                                     command, payload,
                                     parse_qs(url.query))
            except (ValueError, KeyError) as exc:
                self._send(422, {"error": str(exc)})
                return
        self._send(200, out)


def make_server(host: str = "127.0.0.1", port: int = 8090
                ) -> ThreadingHTTPServer:
    """Build (but don't run) the server — models load here, so by the
    time serve_forever starts every request path is warm."""
    srv = ThreadingHTTPServer((host, port), _Handler)
    srv.models = _Models()  # type: ignore[attr-defined]
    srv.inflight = threading.Semaphore(MAX_INFLIGHT)  # type: ignore
    return srv


def main(host: str = "127.0.0.1", port: int = 8090) -> None:
    srv = make_server(host, port)
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "commands": AVAILABLE_COMMANDS}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
